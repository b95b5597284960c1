#!/usr/bin/env python
"""A/B `PipelineConfig.partition_by_doc` at the driver's bench yardstick.

Round-4 verdict item 1: the one-exchange restructure (explicit
repartition(doc_id) shared by the top-1 agg and the overlap windows) was
validated only at local[2]/50k docs, and regressed kg_pipeline_e2e ~1.6x
at the driver's local[32]/20k protocol. This script runs the EXACT bench
headline protocol (same synth corpus, same dims, same noop sink, warm
pass discarded, min of 2 measured passes) with the flag on and off, and
prints one JSON line. Whichever plan wins here is the shipped default.

Usage: python scripts/ab_partition_by_doc.py [--docs 20000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    if "KGSPARK_LOCAL_DIR" not in os.environ and os.access("/dev/shm", os.W_OK):
        os.makedirs("/dev/shm/kgspark-bench", exist_ok=True)
        os.environ["KGSPARK_LOCAL_DIR"] = "/dev/shm/kgspark-bench"

    from kgspark.session import get_spark
    from kgspark import synth
    from kgspark.automaton import write_lexicon_artifact
    from kgspark.canonicalize import close_redirects
    from kgspark.pipeline import (
        PipelineConfig,
        release_pipeline_caches,
        run_pipeline,
    )

    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="kgspark-ab-partition",
        shuffle_partitions=max(2 * args.cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth.synth_documents_distributed(
        spark, args.docs, parts=max(2 * args.cpus, 16)
    ).cache()
    corpus.count()
    lex = synth.lexicon_df(spark)
    sa = synth.sameas_df(spark)
    rd_closed = close_redirects(synth.redirects_df(spark))
    rd_closed.count()
    artifact = tempfile.mkdtemp(prefix="kgspark-ab-lex-")
    write_lexicon_artifact(lex, artifact)

    def one_pass(cfg: PipelineConfig) -> float:
        t0 = time.time()
        out = run_pipeline(spark, corpus, lex, rd_closed, sa, cfg)
        out["triples"].write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_pipeline_caches(out)
        return dt

    result: dict = {"n_docs": args.docs, "cpus": args.cpus, "passes": {}}
    for flag in (True, False):
        cfg = PipelineConfig(
            max_len=7990,
            overlap=500,
            redirects_preclosed=True,
            lexicon_artifact=artifact,
            partition_by_doc=flag,
        )
        one_pass(cfg)  # warm (python worker spawn / JIT), discarded
        times = [round(one_pass(cfg), 3) for _ in range(args.passes)]
        result["passes"][f"partition_by_doc={flag}"] = times
        result[f"partition_by_doc={flag}"] = min(times)
    a, b = result["partition_by_doc=True"], result["partition_by_doc=False"]
    result["winner"] = "True" if a < b else "False"
    result["ratio_true_over_false"] = round(a / b, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
