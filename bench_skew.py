#!/usr/bin/env python
"""Large-document skew evidence (north rule: "skew handled explicitly").

A crawl corpus has a heavy tail: a few documents are 1000x the median
(mega-pages, concatenated dumps). After ``segment()`` explodes documents
into <=7990-char segments, all segments of a giant document still live in
the partition that generated the document — one straggler partition then
gates every downstream stage. ``PipelineConfig.rebalance_segments`` adds a
salted repartition on (doc, seg_off) right after the explode, spreading a
giant document's segments across the cluster.

This bench synthesizes a deliberately skewed corpus (a handful of ~1M-word
documents in a sea of 40-120-word ones, ONE scheduling wave:
parts == cores so stragglers cannot hide behind extra waves), runs the
identical ingest->triples job with rebalance OFF and ON in the same JVM
(alternating passes, best-of-2 per arm), and persists BENCH/SKEW.json.

Usage: python bench_skew.py  (env: KGSPARK_SKEW_DOCS, KGSPARK_SKEW_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main() -> None:
    n_docs = int(os.environ.get("KGSPARK_SKEW_DOCS", "3000"))
    cpus = int(os.environ.get("KGSPARK_SKEW_CPUS", "8"))
    giant_every = max(2, n_docs // 4)  # 4 giant docs
    giant_words = int(os.environ.get("KGSPARK_SKEW_GIANT_WORDS", "1000000"))

    if "KGSPARK_LOCAL_DIR" not in os.environ and os.access("/dev/shm", os.W_OK):
        os.makedirs("/dev/shm/kgspark-skew", exist_ok=True)
        os.environ["KGSPARK_LOCAL_DIR"] = "/dev/shm/kgspark-skew"

    from kgspark import synth
    from kgspark.automaton import write_lexicon_artifact
    from kgspark.canonicalize import close_redirects
    from kgspark.pipeline import PipelineConfig, release_pipeline_caches, run_pipeline
    from kgspark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="kgspark-skew",
                      shuffle_partitions=cpus * 4)
    spark.sparkContext.setLogLevel("ERROR")

    # parts == cpus: one scheduling wave, so the giant-doc partition is a
    # true straggler (extra waves would hide the skew the salting fixes).
    corpus = synth.synth_documents_distributed(
        spark, n_docs, parts=cpus,
        long_doc_every=giant_every, long_doc_words=giant_words,
    ).cache()
    corpus.count()

    lex = synth.lexicon_df(spark)
    sa = synth.sameas_df(spark)
    rd_closed = close_redirects(synth.redirects_df(spark))
    rd_closed.count()
    artifact = tempfile.mkdtemp(prefix="kgspark-skew-lex-")
    write_lexicon_artifact(lex, artifact)

    def once(rebalance: bool) -> float:
        cfg = PipelineConfig(redirects_preclosed=True, lexicon_artifact=artifact,
                             rebalance_segments=rebalance)
        t0 = time.time()
        out = run_pipeline(spark, corpus, lex, rd_closed, sa, cfg)
        out["triples"].write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        release_pipeline_caches(out)  # next pass must recompute, not read cache
        return dt

    # one warm pass per arm (JIT/worker spawn), then alternate measured passes
    warm = {"off": once(False), "on": once(True)}
    passes = {"off": [], "on": []}
    for _ in range(2):
        passes["off"].append(once(False))
        passes["on"].append(once(True))

    best_off, best_on = min(passes["off"]), min(passes["on"])
    result = {
        "n_docs": n_docs, "cpus": cpus,
        "giant_docs": n_docs // giant_every, "giant_words": giant_words,
        "warm": warm, "passes": passes,
        "best_rebalance_off_sec": best_off,
        "best_rebalance_on_sec": best_on,
        "skew_speedup": round(best_off / best_on, 3),
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "SKEW.json"), "w") as fh:
        fh.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
