#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

No real cluster in this sandbox, so we run the identical end-to-end job at
two parallelism levels — local[8] and local[32] — on identical input
(sandbox-approved substitute for N vs 4N executors) in separate processes
(fresh JVM each), and report throughput at both plus
``efficiency = (T_8 / T_32) / (32 / 8)`` into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["KGSPARK_HOME"])
from kgspark.session import get_spark
from kgspark import synth
from kgspark.pipeline import PipelineConfig, run_pipeline

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark(master=f"local[{cpus}]", app_name=f"kgspark-scale-{cpus}",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = synth.synth_documents(spark, n_docs=n_docs).repartition(128).cache(); corpus.count()
lex = synth.lexicon_df(spark)
rd, sa = synth.redirects_df(spark), synth.sameas_df(spark)
def once():
    t0 = time.time()
    out = run_pipeline(spark, corpus, lex, rd, sa, PipelineConfig())
    out["triples"].write.format("noop").mode("overwrite").save()
    return time.time() - t0
# full warm-up pass (python-worker spawn + JIT/codegen), then steady state:
# a 10^12-doc production run is steady-state by definition.
warm = once()
sec = min(once(), once())
print(json.dumps({"cpus": cpus, "sec": round(sec, 3), "warm_sec": round(warm, 3),
                  "n_docs": n_docs, "docs_per_sec": round(n_docs / sec, 1)}))
"""


def run_level(cpus: int, n_docs: int) -> dict:
    env = {**os.environ, "KGSPARK_HOME": HERE}
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n_docs)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(os.environ.get("KGSPARK_SCALE_DOCS", "250000"))
    lo = run_level(8, n_docs)
    hi = run_level(32, n_docs)
    eff = (lo["sec"] / hi["sec"]) / (32 / 8)
    result = {"local8": lo, "local32": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = f"""# BENCH — measured baseline ({n_docs} input_hint-shaped docs, end-to-end ingest->triples)

Cluster-size scaling evidenced per the sandbox rule: identical job + input
at two parallelism levels (local[8] vs local[32] on one machine — the
stand-in for N vs 4N executors), fresh JVM per level. One full warm-up
pass excluded (python-worker spawn + JIT/codegen; a 10^12-doc production
run is steady-state by definition), best of two measured passes.

| level | steady wall (s) | docs/sec | cold first pass (s) |
| --- | --- | --- | --- |
| local[8]  | {lo['sec']} | {lo['docs_per_sec']} | {lo['warm_sec']} |
| local[32] | {hi['sec']} | {hi['docs_per_sec']} | {hi['warm_sec']} |

**Scaling efficiency (T8/T32)/(32/8) = {round(eff, 3)}** (north-rule target >= 0.8).

Pipeline: extract(html->text, pandas UDF) -> segment (+stitch bounds) ->
Aho-Corasick spot (broadcast automaton) -> candidates x broadcast lexicon ->
prior+context disambiguation (window top-1) -> overlap detect/categorize/
resolve (doc-local windows) -> entity types -> redirect/sameAs broadcast
joins -> distinct (subj, pred, obj) triples (noop sink).

Reproduce: `python bench_scaling.py` (env `KGSPARK_SCALE_DOCS` overrides
corpus size). Per-operator timings: `python bench.py`.
"""
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
