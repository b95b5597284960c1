"""Structured Streaming wiring: the ingest path composes under a streaming
plan (file source -> watermark -> windowed agg -> memory sink)."""

import uuid

from kgspark import synth
from kgspark.streaming import streaming_doc_counts


def test_streaming_doc_counts_available_now(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    synth.synth_documents(spark, n_docs=50).write.parquet(docs_dir)
    counts = streaming_doc_counts(spark, docs_dir, window="1 hour")
    qname = f"kgtest_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.sql(f"SELECT sum(n_docs) AS n FROM {qname}").collect()[0]["n"]
    assert got == 50
    langs = {r["lang"] for r in spark.sql(f"SELECT DISTINCT lang FROM {qname}").collect()}
    assert "en" in langs
