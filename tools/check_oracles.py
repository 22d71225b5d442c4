"""Local simulation of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle at the given sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [--skip name1,name2]
                                     [--only name1,name2]

sf_dir tables may be single parquet FILES (the driver's testdata) or
Spark parquet DIRECTORIES named <table>.parquet (tools/gen_big_sf.py
output) — DuckDB views glob <dir>/*.parquet in the latter case.
--skip excludes named entries (the by-design-exhaustive O(n^2) oracles
like jaccard_pairs when gating a large derived corpus).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from letarette_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return f"{float(v):.6f}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main(
    sf_dir: str,
    skip: frozenset[str] = frozenset(),
    only: frozenset[str] = frozenset(),
) -> int:
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    unknown = only - set(qs)
    if unknown:
        print(f"unknown --only entries: {sorted(unknown)}")
        return 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"  {name:24s} SKIP (--skip)")
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(orows)}")
        sn = norm_rows(scols, [[r[c] for c in scols] for r in srows])
        on = norm_rows(ocols, orows)
        if sn != on:
            diff = [
                (a, b) for a, b in zip(sn, on) if a != b
            ][:3]
            extra_s = [r for r in sn if r not in on][:2]
            extra_o = [r for r in on if r not in sn][:2]
            status.append(f"VALUES diff={diff} onlyspark={extra_s} onlyduck={extra_o}")
        if status:
            failures += 1
            print(f"  {name:24s} FAIL  " + " | ".join(status))
        else:
            print(f"  {name:24s} OK    {len(srows)} rows")
    spark.stop()
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--skip", default="",
                    help="comma-separated query names to exclude")
    ap.add_argument("--only", default="",
                    help="comma-separated query names to run exclusively")
    args = ap.parse_args()
    skip = frozenset(s for s in args.skip.split(",") if s)
    only = frozenset(s for s in args.only.split(",") if s)
    sys.exit(main(args.sf_dir, skip, only))
