#!/usr/bin/env python3
"""Deterministic must-read audit for the z-ordered lineitem layout.

For q74's rectangle slice (l_partkey <= max//8 AND l_shipdate in 1996),
count the row groups whose footer min/max stats intersect the predicate
and sum the read-schema column-chunk bytes they carry — the bytes a
footer-pruning reader MUST fetch. Run for the z layout and the plain
table; the ratio is the layout's IO claim, independent of box weather
(on local[32] with a hot page cache the wall barely moves — the skipped
bytes are network/disk on a real cluster).

Usage: zorder_bytes.py <zorder_lineitem_dir> <plain_lineitem_dir>
"""
import sys, glob, datetime
import pyarrow.parquet as pq

COLS = {'l_partkey', 'l_shipdate', 'l_returnflag', 'l_quantity',
        'l_extendedprice', 'l_discount'}
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


def max_partkey(path):
    m = None
    for fp in files_of(path):
        f = pq.ParquetFile(fp)
        for i in range(f.num_row_groups):
            md = f.metadata.row_group(i)
            for j in range(md.num_columns):
                c = md.column(j)
                if c.path_in_schema == 'l_partkey':
                    v = c.statistics.max
                    m = v if m is None else max(m, v)
    if m is None:
        sys.exit(f"zorder_bytes: no l_partkey stats under {path}")
    return m


def must_read(path, pk_bound):
    tot_rg = read_rg = tot_b = read_b = 0
    for fp in files_of(path):
        f = pq.ParquetFile(fp)
        for i in range(f.num_row_groups):
            md = f.metadata.row_group(i)
            cols = {md.column(j).path_in_schema: md.column(j)
                    for j in range(md.num_columns)}
            b = sum(c.total_compressed_size
                    for n, c in cols.items() if n in COLS)
            tot_rg += 1
            tot_b += b
            sd = cols['l_shipdate'].statistics
            pk = cols['l_partkey'].statistics
            if sd.min < HI and sd.max >= LO and pk.min <= pk_bound:
                read_rg += 1
                read_b += b
    return tot_rg, read_rg, tot_b, read_b


if __name__ == '__main__':
    zdir, pdir = sys.argv[1], sys.argv[2]
    bound = max_partkey(pdir) // 8
    for tag, p in [('zorder', zdir), ('plain ', pdir)]:
        t, r, tb, rb = must_read(p, bound)
        print(f"{tag} rowgroups {r}/{t} must-read, "
              f"bytes {rb/2**20:.0f}/{tb/2**20:.0f} MiB")
