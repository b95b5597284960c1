#!/usr/bin/env python
"""Per-stage scaling breakdown (VERDICT.md round-1 item 3).

Times each pipeline stage in isolation (input persisted, output forced to
a noop sink) at two parallelism levels in fresh JVMs, and prints the
stage-by-stage efficiency table — the evidence for WHERE the N->4N step
loses efficiency on a single box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, os.environ["KGSPARK_HOME"])
from pyspark.sql import functions as F
from kgspark.session import get_spark
from kgspark import synth, disambig, entity_types, overlaps, segment, spot, triples
from kgspark.automaton import write_lexicon_artifact
from kgspark.canonicalize import canonicalize, close_redirects
from kgspark.extract import extract_text

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
# shuffle partitions scale with the core count (4 tasks/core), as they
# would on a real cluster — a fixed 64 hands the 2-core level 32 waves of
# per-task overhead and charges the difference to "scaling".
spark = get_spark(master=f"local[{cpus}]", app_name=f"kgspark-stages-{cpus}",
                  shuffle_partitions=4 * cpus)
spark.sparkContext.setLogLevel("ERROR")

def force(df):
    df.write.format("noop").mode("overwrite").save()

def persisted(df):
    df = df.persist()
    df.count()
    return df

corpus = persisted(synth.synth_documents_distributed(spark, n_docs, parts=128))
lex = synth.lexicon_df(spark)
sa = synth.sameas_df(spark)
rd_closed = persisted(close_redirects(synth.redirects_df(spark)))
artifact = tempfile.mkdtemp(prefix="kgspark-stages-lex-")
write_lexicon_artifact(lex, artifact)

timings = {}

def timed(name, build, reps=2):
    best = None
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = build()
        force(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings[name] = round(best, 3)
    return out

# stage 1: extract (pandas UDF over html) — time BEFORE persisting: a
# persisted identical plan would turn the timed run into a cache read
timed("extract", lambda: extract_text(corpus))
docs = persisted(extract_text(corpus))

# stage 2: segment + spot + stitch (narrow UDF + explode)
def seg_spot():
    segs = segment.segment_documents(docs, max_len=7990, overlap=500).withColumn(
        "doc_tokens", disambig.hashed_tokens(F.col("text"))
    )
    return segment.stitch_filter(
        spot.spot_segments(segs, artifact, doc_col="url",
                           keep_extra=("keep_from", "keep_to", "doc_tokens"))
    )
timed("segment+spot", seg_spot)
spots = persisted(seg_spot())

# stage 3: link (broadcast lexicon join + min_by top-1)
def link():
    return disambig.link_mentions(spots, lex, docs, doc_col="url",
                                  min_support=20, confidence=0.35,
                                  partition_by_doc=True)
timed("link", link)
linked = persisted(link())

# stage 4: overlaps (doc-partitioned window family) — via overlap_pipeline,
# the production composition (ONE hit/miss split; the naive
# detect->categorize->resolve chain re-filters and re-computes its
# upstream branches and measures ~3x the real cost)
def ovl():
    return overlaps.overlap_pipeline(
        linked, keep=["longest", "shortest", "multiple"], doc_col="doc_id"
    ).drop(*list(overlaps.OVL_FLAGS))
timed("overlaps", ovl)
resolved = persisted(ovl())

# stage 5: types + canonicalize (pure exprs + broadcast joins)
def canon():
    typed = entity_types.entity_types_map(resolved, [
        ("PERSON", "DBpedia:Person"), ("ORGANIZATION", "DBpedia:Organisation"),
        ("LOCATION", "DBpedia:Place")])
    return canonicalize(typed, rd_closed, sa)
timed("types+canonicalize", canon)
canonical = persisted(canon())

# stage 6: triples (pair explode + global distinct — THE shuffle)
timed("triples_distinct", lambda: triples.mentions_to_triples(canonical))

print(json.dumps({"cpus": cpus, "n_docs": n_docs, "stages": timings,
                  "total": round(sum(timings.values()), 3)}))
"""


def run_level(cpus: int, n_docs: int) -> dict:
    env = {**os.environ, "KGSPARK_HOME": HERE}
    # Pin JVM + python workers to exactly `cpus` cores — bare local[N]
    # only bounds task slots (see bench_scaling.Level for the rationale).
    cmd = [sys.executable, "-c", CHILD, str(cpus), str(n_docs)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, env=env, timeout=1800,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(1)
    return json.loads(lines[-1])


def main() -> None:
    n_docs = int(os.environ.get("KGSPARK_SCALE_DOCS", "100000"))
    levels = [int(x) for x in os.environ.get("KGSPARK_SCALE_LEVELS", "8,32").split(",")]
    runs = {c: run_level(c, n_docs) for c in levels}
    lo_c, hi_c = levels[0], levels[-1]
    lo, hi = runs[lo_c], runs[hi_c]
    table = []
    for name in lo["stages"]:
        eff = (lo["stages"][name] / hi["stages"][name]) / (hi_c / lo_c)
        table.append((name, lo["stages"][name], hi["stages"][name], round(eff, 3)))
    result = {"levels": runs, "per_stage_efficiency": {t[0]: t[3] for t in table}}
    print(json.dumps(result))
    for t in table:
        print(f"  {t[0]:<22} local[{lo_c}] {t[1]:>8.2f}s  local[{hi_c}] {t[2]:>8.2f}s  eff {t[3]}")
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "STAGES.json"), "w") as fh:
        fh.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
