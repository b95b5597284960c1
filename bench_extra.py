#!/usr/bin/env python
"""Isolation benchmarks (guide §1.4): time individual queries or pipeline
stages with the noop sink, warm + min-of-2, in a fresh session — without
touching the frozen driver harness in bench.py.

Usage:
  python bench_extra.py q spot_mentions triples          # isolated queries
  python bench_extra.py pipeline --docs 20000            # per-stage e2e split
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if "KGSPARK_LOCAL_DIR" not in os.environ and os.access("/dev/shm", os.W_OK):
    os.makedirs("/dev/shm/kgspark-bench", exist_ok=True)
    os.environ["KGSPARK_LOCAL_DIR"] = "/dev/shm/kgspark-bench"


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _timeit(fn, passes: int = 2):
    fn()  # warm
    out = []
    for _ in range(passes):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return min(out), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["q", "pipeline"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from kgspark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]", app_name="kgspark-bench-extra",
        shuffle_partitions=max(2 * args.cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    if args.mode == "q":
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        for name in args.names:
            spark.sparkContext.setJobDescription(f"isolated:{name}")
            best, samples = _timeit(lambda: _force(qs[name](spark, args.sf)))
            timings[name] = best
            print(f"{name:26s} {best:8.3f}  {samples}", file=sys.stderr)
    else:
        from kgspark import synth
        from kgspark.automaton import write_lexicon_artifact
        from kgspark.canonicalize import close_redirects
        from kgspark.pipeline import (
            PipelineConfig, release_pipeline_caches, run_pipeline,
        )
        import tempfile

        corpus = synth.synth_documents_distributed(
            spark, args.docs, parts=max(2 * args.cpus, 16)
        ).cache()
        corpus.count()
        lex = synth.lexicon_df(spark)
        sa = synth.sameas_df(spark)
        rd = close_redirects(synth.redirects_df(spark))
        rd.count()
        artifact = tempfile.mkdtemp(prefix="kgspark-bx-lex-")
        write_lexicon_artifact(lex, artifact)
        cfg = PipelineConfig(max_len=7990, overlap=500,
                             redirects_preclosed=True,
                             lexicon_artifact=artifact)

        # stage-by-stage: force each intermediate in dependency order so
        # each delta is the marginal cost of that stage (caches released
        # between full passes exactly like bench.py)
        stages = ["documents", "segments", "spots", "mentions",
                  "resolved", "canonical", "triples"]

        def one_pass(upto: str) -> float:
            t0 = time.time()
            out = run_pipeline(spark, corpus, lex, rd, sa, cfg)
            _force(out[upto])
            dt = time.time() - t0
            release_pipeline_caches(out)
            return dt

        for s in stages:
            spark.sparkContext.setJobDescription(f"pipeline-upto:{s}")
            one_pass(s)  # warm
            samples = [round(one_pass(s), 3) for _ in range(2)]
            timings[f"upto_{s}"] = min(samples)
            print(f"upto {s:12s} {min(samples):8.3f}  {samples}",
                  file=sys.stderr)

    print(json.dumps({"metric": "bench_extra", "mode": args.mode,
                      "timings": timings, "sf": args.sf,
                      "cpus": args.cpus}))


if __name__ == "__main__":
    main()
