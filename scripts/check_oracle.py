#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column-name set, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 9))
    except ImportError:
        pass
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from kgspark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"{name:24s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in osql:
            print(f"{name:24s} rows-only   n={len(srows)}  ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        cols_ok = sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
        n_ok = len(srows) == len(orows)
        h_ok = cols_ok and table_hash(scols, [tuple(r) for r in srows]) == table_hash(
            ocols, orows
        )
        status = "MATCH" if (cols_ok and n_ok and h_ok) else "MISMATCH"
        print(
            f"{name:24s} {status}  n_spark={len(srows)} n_oracle={len(orows)} "
            f"cols_ok={cols_ok} hash_ok={h_ok}  ({time.time()-t0:.1f}s)"
        )
        if status == "MISMATCH":
            failures.append(name)
            if args.show_diff:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i].lower())
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
                sset = {tuple(norm_cell(r[i]) for i in order_s) for r in srows}
                oset = {tuple(norm_cell(r[i]) for i in order_o) for r in orows}
                print("  spark cols:", scols, "oracle cols:", ocols)
                for x in sorted(sset - oset)[:5]:
                    print("  spark-only:", x)
                for x in sorted(oset - sset)[:5]:
                    print("  oracle-only:", x)
    print(f"\n{len(names) - len(failures)}/{len(names)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
