"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so payload bytes never round-trip
through Python row objects. The actual codec step is STUBBED (no
image/audio libraries in this container): ``decode_mode="fake"`` produces a
deterministic md5-derived feature vector with the real batch shape;
``decode_mode="real"`` raises NotImplementedError at the exact seam where
PIL/ffmpeg would plug in. Everything around the stub — schema, partition
sizing, UDF signature, batch iteration, Spark-side frame fan-out — is real,
tested, and oracle-checked: the media table is derived from ``documents``
with pure arithmetic and the fake features are md5-derived, so DuckDB can
recompute both bit-identically (``kgspark.oracles.q_media_features``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_table(
    docs: DataFrame, n: int = 48, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from the documents table.

    Pure column expressions — payload is the UTF-8 bytes of ``text`` and
    every metadata field is arithmetic on the id — so the DuckDB oracle
    recomputes identical rows straight from the ``documents`` view. kind
    cycles image/audio/video by ``id % 3``; only images carry dimensions,
    only audio/video a duration.
    """
    mid = F.col(id_col).cast("long")
    kind = (
        F.when(mid % 3 == 0, "image").when(mid % 3 == 1, "audio").otherwise("video")
    )
    return docs.filter(mid < n).select(
        mid.alias("media_id"),
        F.concat(F.lit("https://example.org/media/"), mid.cast("string")).alias("url"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(mid % 3 == 0, (16 + (mid * 37) % 240).cast("int")).alias("width"),
        F.when(mid % 3 == 0, (16 + (mid * 53) % 240).cast("int")).alias("height"),
        F.when(mid % 3 != 0, 1000 + (mid * 7919) % 59000).alias("duration_ms"),
    )


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Standalone fixture: same shape/arithmetic as ``media_table`` over a
    synthetic id range (payload = utf-8 of a seeded marker string)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"media-{seed}-"), F.col("id").cast("string")).alias("text"),
    )
    return media_table(base, n=n)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: md5 digest
    bytes scaled to [0,1]. Mirrored in SQL via substr(md5(text), ...)"""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


def _fake_frame_feature(payload: bytes, ts_ms: int, dim: int = 8) -> list[float]:
    """Per-frame variant: md5(md5_hex(payload) || '-' || ts) — string-level
    composition so the oracle can rebuild it without binary concatenation."""
    digest = hashlib.md5(
        (hashlib.md5(payload).hexdigest() + "-" + str(ts_ms)).encode("ascii")
    ).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


def feature_sig(col, dim: int = 8):
    """Exact integer rendering of a fake feature vector (digest bytes,
    pipe-joined) — the value-hash-stable projection used by the oracle
    gate; float formatting never enters the comparison."""
    return F.array_join(
        F.transform(col, lambda x: F.round(x * 255).cast("int").cast("string")), "|"
    )


def extract_features(
    media: DataFrame, decode_mode: str = "fake", feature_dim: int = 8
) -> DataFrame:
    """mapInPandas feature extraction with the production batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — plug the codec "
                    "in here; the surrounding plumbing is production-shaped"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": [
                        None if p is None else _fake_feature(bytes(p), feature_dim)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_mode: str = "fake"
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp.

    The fan-out happens Spark-side (``explode(sequence(...))``) so the
    kernel sees one already-exploded row per frame and stays a flat
    column-parallel pass — no per-row iteration, no Python-side loops over
    timestamps.
    """
    frames = media.filter(
        (F.col("kind") == "video") & F.col("duration_ms").isNotNull()
    ).select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError("real frame decode not available here")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame_feature": [
                        _fake_frame_feature(bytes(p), int(ts))
                        for p, ts in zip(pdf["payload"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return frames.mapInPandas(kernel, FRAMES_SCHEMA)
