"""Streaming-shaped operators.

The reference is batch-only (SURVEY §2.9); a crawl-scale engine still needs
the stream-processing shapes. Two layers:

- ``sessionize``: gap-based sessionization as a batch window plan (lag +
  running sum) — the relational formulation that also serves as the DuckDB
  oracle target.
- ``streaming_doc_counts``: a Structured Streaming wiring of the ingest
  path (readStream -> watermark -> windowed count) used by tests to prove
  the pipeline's transforms compose under a streaming plan; at production
  scale this is the incremental-crawl entry (new WARC partitions as a file
  stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session ids per user (batch analogue of
    ``session_window``): a new session starts when the time since the
    previous event exceeds the gap."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(ts_col).over(w)
    # parquet timestamps read as TIMESTAMP_NTZ can't cast straight to long;
    # go through timestamp_ltz (session tz is pinned to UTC).
    epoch = lambda c: c.cast("timestamp_ltz").cast("long")
    gap = epoch(F.col(ts_col)) - epoch(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess_n = F.sum(F.col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("_new", is_new)
        .withColumn(
            "session_id",
            F.format_string("%d-%d", F.col(user_col), sess_n),
        )
        .drop("_new")
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    s = sessionize(events, gap_minutes=gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def streaming_doc_counts(spark, docs_path: str, window: str = "1 hour") -> DataFrame:
    """readStream over a parquet documents directory -> watermarked windowed
    counts per lang. Returned unstarted (caller picks sink/trigger)."""
    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .parquet(docs_path)
    )
    return (
        stream.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_docs")
    )
