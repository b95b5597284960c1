#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named driver queries to files.

Round-6 deliverable helper: run once from the round-start tree (a git
worktree) with ``--suffix before`` and once from the optimized tree with
``--suffix after``; the judge diffs the plan shapes against the claims in
OPTIMIZATION_r06.md.

Usage: python scripts/capture_plans.py --out plans/r06 --suffix after [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from kgspark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master="local[8]", app_name="capture-plans",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"<explain failed: {exc!r}>\n"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes -> {path}")


if __name__ == "__main__":
    main()
