#!/usr/bin/env python3
"""Floor-corrected decomposition of a Spark/DuckDB pair (VERDICT r11 #3).

The suite ratio (sum of Spark per-query mins / sum of DuckDB mins) has
two components with different meanings at deployment scale:

  - the DATA-WEIGHTED term: queries where Spark's min is >= the floor
    cut (default 0.5 s) — here the ratio measures the data path, the
    thing that scales to 100 TB;
  - the FIXED-FLOOR term: sub-floor queries, where Spark pays a fixed
    ~0.1-0.3 s per-query scheduling/codegen floor against a
    single-process comparator that answers in milliseconds. Each such
    probe adds ~0.015 of suite ratio REGARDLESS of any data-path
    quality (pair37->41: 1.751->1.783 was exactly this) — on a real
    cluster this term amortizes to nothing, but in the gate arithmetic
    it erodes the <=2x margin linearly with probe count.

This tool makes both terms visible so the erosion mechanism is bounded
instead of silently eating the margin.

Usage: pair_ratio.py <spark_bench_stderr> <duckdb_json>[,<duckdb_json>...]
       [floor_sec]

Multiple comma-separated DuckDB artifacts are PER-QUERY MIN-merged
(round 17, VERDICT r16 #5): the r16 pairs took the best of three legs by
TOTAL, which still lets one slow query inside the best leg distort its
term when the comparator side has weather (PAIRS_r16 measured ~1.5x
uniform drift between legs on unchanged oracle texts). Per-query min
across legs is the same min-of-k estimator Bench applies to its own
passes, applied symmetrically to the comparator; each leg's total and
calibration stay disclosed in the output.
"""
import json
import re
import sys


def spark_mins(path):
    txt = open(path, errors="replace").read()
    m = None
    for m in re.finditer(r"\[bench-detail\] (\{\"mins\".*)", txt):
        pass
    if m is None:
        sys.exit(f"no [bench-detail] mins line in {path}")
    return json.loads(m.group(1))["mins"]


def duck_mins(paths):
    """Per-query min across the given DuckDB artifacts, with per-leg
    disclosure (total + calib) so the merge is auditable."""
    legs = [json.load(open(p)) for p in paths]
    for p, leg in zip(paths, legs):
        q = leg["queries"]
        print(f"  duck leg {p}: total {sum(q.values()):.2f}s "
              f"calib {leg.get('calib_before_s', '?')}/"
              f"{leg.get('calib_after_s', '?')}")
    merged = {}
    for leg in legs:
        for k, v in leg["queries"].items():
            if v > 0 and (k not in merged or v < merged[k]):
                merged[k] = v
    return merged


def main():
    spark = spark_mins(sys.argv[1])
    duck = duck_mins(sys.argv[2].split(","))
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    common = sorted(q for q in spark
                    if q in duck and spark[q] > 0 and duck[q] > 0)
    if not common:
        sys.exit("no common queries")
    s_all = sum(spark[q] for q in common)
    d_all = sum(duck[q] for q in common)
    heavy = [q for q in common if spark[q] >= floor]
    light = [q for q in common if spark[q] < floor]
    s_h = sum(spark[q] for q in heavy)
    d_h = sum(duck[q] for q in heavy)
    s_l = sum(spark[q] for q in light)
    d_l = sum(duck[q] for q in light)
    print(f"pair over {len(common)} queries: "
          f"spark {s_all:.2f}s / duckdb {d_all:.2f}s = {s_all/d_all:.3f}")
    print(f"  data-weighted (spark >= {floor}s, {len(heavy)} queries): "
          f"{s_h:.2f}/{d_h:.2f} = {s_h/d_h:.3f}")
    if d_l > 0:
        print(f"  fixed-floor   (spark <  {floor}s, {len(light)} queries): "
              f"{s_l:.2f}/{d_l:.2f} = {s_l/d_l:.3f}")
        # how much of the headline ratio the floor term contributes:
        # headline - ratio_with_floor_queries_removed
        print(f"  floor contribution to headline: "
              f"{s_all/d_all - s_h/d_h:+.3f} "
              f"(headline {s_all/d_all:.3f} vs heavy-only {s_h/d_h:.3f})")
    out = {"n": len(common), "ratio": round(s_all / d_all, 3),
           "floor_sec": floor,
           "heavy": {"n": len(heavy), "spark_s": round(s_h, 2),
                     "duck_s": round(d_h, 2),
                     "ratio": round(s_h / d_h, 3) if d_h else None},
           "light": {"n": len(light), "spark_s": round(s_l, 2),
                     "duck_s": round(d_l, 2),
                     "ratio": round(s_l / d_l, 3) if d_l else None}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
