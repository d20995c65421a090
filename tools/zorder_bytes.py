#!/usr/bin/env python3
"""Deterministic must-read audit for the clustered lineitem layouts.

For each layout, count the row groups whose footer min/max stats
intersect the slice predicates and sum the read-schema column-chunk
bytes they carry — the bytes a footer-pruning reader MUST fetch. The
ratio vs the plain table is the layout's IO claim, independent of box
weather (on local[32] with a hot page cache the wall barely moves —
the skipped bytes are network/disk on a real cluster).

Two audits, matching the two probe queries:
  - q74 slice (2-dim):  l_partkey <= max//8 AND l_shipdate in 1996
  - q77 box   (3-dim):  the q74 slice AND l_suppkey <= max//4

Usage: zorder_bytes.py <plain_dir> <zorder_dir> [hilbert_dir]

(arg order changed in round 12 from <zorder> <plain>: the plain table
now leads because it is the bounds source and the denominator.)
"""
import sys, glob, datetime
import pyarrow.parquet as pq

# read schema of the probe queries' scans; q74 never reads l_suppkey
COLS2 = {'l_partkey', 'l_shipdate', 'l_returnflag', 'l_quantity',
         'l_extendedprice', 'l_discount'}
COLS3 = COLS2 | {'l_suppkey'}
LO = datetime.datetime(1996, 1, 1)
HI = datetime.datetime(1997, 1, 1)


def files_of(path):
    """Parquet leaf files of a dir-table OR a single-file table; loud on
    a path mistake — a silent empty glob would zero both sides of the
    audit (the no-silent-zero bench rule)."""
    if path.endswith('.parquet') and not glob.glob(f"{path}/*.parquet"):
        fs = [path]
    else:
        fs = sorted(glob.glob(f"{path}/*.parquet"))
    if not fs:
        sys.exit(f"zorder_bytes: no parquet files under {path}")
    return fs


def col_max(path, name):
    m = None
    for fp in files_of(path):
        f = pq.ParquetFile(fp)
        for i in range(f.num_row_groups):
            md = f.metadata.row_group(i)
            for j in range(md.num_columns):
                c = md.column(j)
                if c.path_in_schema == name:
                    v = c.statistics.max
                    m = v if m is None else max(m, v)
    if m is None:
        sys.exit(f"zorder_bytes: no {name} stats under {path}")
    return m


def must_read(path, pk_bound, sk_bound, cols):
    """sk_bound=None runs the 2-dim q74 slice; a bound adds the q77
    suppkey predicate. Returns (total_rg, read_rg, total_b, read_b)."""
    tot_rg = read_rg = tot_b = read_b = 0
    for fp in files_of(path):
        f = pq.ParquetFile(fp)
        for i in range(f.num_row_groups):
            md = f.metadata.row_group(i)
            rg = {md.column(j).path_in_schema: md.column(j)
                  for j in range(md.num_columns)}
            b = sum(c.total_compressed_size
                    for n, c in rg.items() if n in cols)
            tot_rg += 1
            tot_b += b
            sd = rg['l_shipdate'].statistics
            pk = rg['l_partkey'].statistics
            hit = sd.min < HI and sd.max >= LO and pk.min <= pk_bound
            if hit and sk_bound is not None:
                hit = rg['l_suppkey'].statistics.min <= sk_bound
            if hit:
                read_rg += 1
                read_b += b
    return tot_rg, read_rg, tot_b, read_b


if __name__ == '__main__':
    layouts = [('plain  ', sys.argv[1]), ('zorder ', sys.argv[2])]
    if len(sys.argv) > 3:
        layouts.append(('hilbert', sys.argv[3]))
    pk_bound = col_max(sys.argv[1], 'l_partkey') // 8
    sk_bound = col_max(sys.argv[1], 'l_suppkey') // 4
    print("== q74 slice (partkey & shipdate) ==")
    for tag, p in layouts:
        t, r, tb, rb = must_read(p, pk_bound, None, COLS2)
        print(f"{tag} rowgroups {r}/{t} must-read, "
              f"bytes {rb/2**20:.0f}/{tb/2**20:.0f} MiB")
    print("== q77 box (partkey & shipdate & suppkey) ==")
    for tag, p in layouts:
        t, r, tb, rb = must_read(p, pk_bound, sk_bound, COLS3)
        print(f"{tag} rowgroups {r}/{t} must-read, "
              f"bytes {rb/2**20:.0f}/{tb/2**20:.0f} MiB")
