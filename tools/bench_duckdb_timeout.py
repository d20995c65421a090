#!/usr/bin/env python3
"""bench_duckdb variant with a per-query wall timeout (for large scale
factors where a single oracle replay can run for hours): each query runs
in its own subprocess; timeout -> recorded as -2 (DNF) and excluded from
the total, like -1 failures. Usage:
  bench_duckdb_timeout.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import sys, os, json, subprocess

sfdir, outdir = sys.argv[1], sys.argv[2]
timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

WORKER = r'''
import sys, os, json, time
import duckdb
sfdir = sys.argv[1]
sql = sys.stdin.read()
con = duckdb.connect()
con.execute("SET enable_progress_bar=false")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
con.execute(sql).fetchall()  # warmup
samples = []
for _ in range(3):
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    samples.append(time.perf_counter() - t0)
print(json.dumps(min(samples)))
'''

times = {}
for name in sorted(oracle):
    if name.startswith("ss_"):
        continue
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, sfdir],
                           input=oracle[name], capture_output=True,
                           text=True, timeout=timeout)
        if r.returncode != 0:
            times[name] = -1.0
            print(f"ERR {name}: {r.stderr.strip()[:200]}", file=sys.stderr)
        else:
            times[name] = float(r.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        times[name] = -2.0
        print(f"DNF {name}: exceeded {timeout}s", file=sys.stderr)
total = sum(v for v in times.values() if v >= 0)
dnf = [k for k, v in times.items() if v == -2.0]
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": times, "dnf": dnf, "sf": sfdir}))
