#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each SparkEntry query
output (parquet written by graft.Verify), run the oracle SQL in DuckDB over
the same testdata parquet tables and compare values exactly.
Usage: check_oracle.py <sfDir> <outDir>
"""
import sys, os, json
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
names = sorted([d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d))])
fails = 0
for name in names:
    got = None
    try:
        got = pd.read_parquet(os.path.join(outdir, name))
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1; continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows-only check), rows={len(got)}")
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    # driver sorts columns by name before hashing values
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    # row-order-insensitive compare: sort by all columns
    try:
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    except Exception:
        gs, es = g.reset_index(drop=True), e.reset_index(drop=True)
    bad = []
    for c in gs.columns:
        a, b = gs[c], es[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            af, bf = a.astype(float).values, b.astype(float).values
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}: row {i}: {af[i]!r} != {bf[i]!r} (diff {af[i]-bf[i]:.3e})")
        else:
            av = a.astype(str).values; bv = b.astype(str).values
            eq = av == bv
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}: row {i}: {av[i]!r} != {bv[i]!r}")
    if bad:
        print(f"FAIL {name}: value mismatch: " + "; ".join(bad[:3])); fails += 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
print(f"\n{len(names)-fails}/{len(names)} passed")
sys.exit(1 if fails else 0)
