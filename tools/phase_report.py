#!/usr/bin/env python3
"""Phase forensics for a graft Bench run: quantify burst steal from the
run's own per-query evidence instead of the edge rulers.

The [bench-detail] stderr line carries full-precision per-query MINS and
MEDIANS (min-of-passes vs median-of-passes). On a calm box they agree;
an all-core burst inflates some passes, so median >> min on the queries
whose timed passes straddled it. Two reports come out of that:

  1. per-query median/min ratio — which queries' passes caught a burst;
  2. cross-RUN comparison (optional second file) — per-query ratios of
     the two runs' MINS. A UNIFORM shift across unrelated query families
     is box weather (the pair29-35 signature); a LOCALIZED shift names
     the queries a code change actually moved.

Usage:
  tools/phase_report.py <bench_stderr> [<baseline_bench_stderr>]
"""
import json
import re
import sys


def detail(path):
    txt = open(path, errors="replace").read()
    m = None
    for m in re.finditer(r"\[bench-detail\] (\{\"mins\".*)", txt):
        pass
    if m is None:
        sys.exit(f"no [bench-detail] mins line in {path}")
    return json.loads(m.group(1))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    d = detail(sys.argv[1])
    mins, medians = d["mins"], d["medians"]
    print(f"== within-run: median/min per query ({sys.argv[1]})")
    rows = sorted(
        ((medians[q] / mins[q], q) for q in mins if q in medians and mins[q] > 0),
        reverse=True,
    )
    burst = [(r, q) for r, q in rows if r > 1.15]
    for r, q in burst[:15]:
        print(f"  {q:28s} median/min {r:5.2f}  (min {mins[q]:.3f}s)")
    n = len(rows)
    print(f"  {len(burst)}/{n} queries with >15% median-over-min "
          f"({'burst-straddled run' if len(burst) > n / 4 else 'mostly calm run'})")

    if len(sys.argv) > 2:
        base = detail(sys.argv[2])["mins"]
        common = [q for q in mins if q in base and base[q] > 0.05]
        ratios = sorted(((mins[q] / base[q], q) for q in common), reverse=True)
        import statistics
        med = statistics.median(r for r, _ in ratios)
        spread = [(r, q) for r, q in ratios if abs(r - med) > 0.25]
        print(f"\n== cross-run: this run's mins / baseline's mins "
              f"({len(common)} common queries)")
        print(f"  median ratio {med:.2f} "
              f"({'uniform shift = box weather' if len(spread) < len(common) / 5 else 'localized shifts — inspect below'})")
        for r, q in (spread or ratios[:5])[:12]:
            print(f"  {q:28s} {r:5.2f}  ({base[q]:.3f}s -> {mins[q]:.3f}s)")


if __name__ == "__main__":
    main()
