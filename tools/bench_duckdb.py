#!/usr/bin/env python3
"""Comparator for BENCH: run every SparkEntry oracle SQL text in DuckDB over
the same parquet tables and report per-query seconds (warmup + min of 3,
mirroring graft.Bench). Usage: bench_duckdb.py <sfDir> <verifyOutDir>

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
"""
import sys, os, json, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # multi-file tables (e.g. ScaleGen output)
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
times = {}
for name in sorted(oracle):
    if name.startswith("ss_"):  # fixed-size reference workload: correctness
        continue                # surface, excluded from the scaling bench

    sql = oracle[name]
    try:
        con.execute(sql).fetchall()  # warmup
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        times[name] = min(samples)
    except Exception as e:
        times[name] = -1.0
        print(f"ERR {name}: {e}", file=sys.stderr)
total = sum(v for v in times.values() if v >= 0)
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": times, "sf": sfdir}))
