"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so payload bytes never round-trip
through Python row objects. The actual codec step is STUBBED (no
image/audio libraries in this container): ``decode_mode="fake"`` produces a
deterministic hash-derived feature vector with the real batch shape;
``decode_mode="real"`` raises NotImplementedError at the exact seam where
PIL/ffmpeg would plug in. Everything around the stub — schema, partition
sizing, UDF signature, batch iteration — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.randint(64, 512)))
        rows.append(
            (
                i,
                f"https://example.org/media/{i}",
                kind,
                payload,
                int(rng.randint(16, 256)) if kind == "image" else None,
                int(rng.randint(16, 256)) if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA]), MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding."""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


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
            feats = [
                None if p is None else _fake_feature(bytes(p), feature_dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_mode: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError("real frame decode not available here")
            out = {"media_id": [], "frame_ts_ms": [], "frame_feature": []}
            for _, row in pdf.iterrows():
                if row["kind"] != "video" or row["duration_ms"] is None:
                    continue
                for ts in range(0, int(row["duration_ms"]), every_ms):
                    out["media_id"].append(row["media_id"])
                    out["frame_ts_ms"].append(ts)
                    out["frame_feature"].append(
                        _fake_feature(bytes(row["payload"]) + ts.to_bytes(8, "big"))
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema)
