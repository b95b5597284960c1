"""WARC container round-trip: pure record codec + distributed read/write."""

import gzip

from pyspark.sql import functions as F

from kgspark.warc import (
    build_warc_bytes,
    build_warc_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def test_record_codec_roundtrip():
    recs = [
        ("http://a.example/x", "2026-01-01T00:00:00Z", b"hello world"),
        ("http://b.example/y", "2026-01-02T00:00:00Z", b""),
        # payload containing the record separator must not confuse the
        # parser (Content-Length framing, not delimiter scanning)
        ("http://c.example/z", "2026-01-03T00:00:00Z", b"a\r\n\r\nWARC/1.0\r\nb"),
    ]
    parsed = parse_warc_bytes(build_warc_bytes(recs))
    assert [(r["url"], r["warc_ts"], r["payload"]) for r in parsed] == recs
    assert all(r["record_type"] == "response" for r in parsed)


def test_record_codec_gzip_members():
    recs = [
        ("http://a/1", "2026-01-01T00:00:00Z", b"p1"),
        ("http://a/2", "2026-01-01T00:00:01Z", b"p2"),
    ]
    # .warc.gz convention: one gzip member per record, concatenated
    blob = b"".join(
        gzip.compress(build_warc_record(u, t, p)) for u, t, p in recs
    )
    parsed = parse_warc_bytes(blob)
    assert [(r["url"], r["payload"]) for r in parsed] == [
        ("http://a/1", b"p1"), ("http://a/2", b"p2")
    ]


def test_distributed_write_read_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc body {i} " * 3) for i in range(50)],
        "doc_id long, text string",
    ).repartition(4)
    payloads = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = str(tmp_path / "warc")
    write_warc(payloads, out)
    back = read_warc(spark, out).select(
        F.regexp_extract("url", r"doc://(\d+)", 1).cast("long").alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"),
    )
    got = sorted((r["doc_id"], r["text"]) for r in back.collect())
    want = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    assert got == want
