"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
partition sizing, mapInPandas signatures. The codec step is a clearly-marked
STUB (no image/audio libraries in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic sha256-derived feature vector so downstream operators
(similarity search over the features, dedup by feature hash) are exercised
end-to-end with stable goldens.

Production swap-in: replace ``_fake_features`` with PIL/torchvision (images)
or torchaudio (audio) inside the same ``mapInPandas`` iterator — batch shape
and schema are unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature vector: sha256 bytes -> [0,1) floats."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / np.float32(65536.0)


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """media table -> (media_id, n_bytes, features[FEATURE_DIM]).

    STUB: real decode (PIL/libav) is not available in this container.
    ``fake=False`` raises NotImplementedError at execution time, by design.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/torchaudio — not installed; "
                    "use fake=True for the deterministic test codec"
                )
            feats = [
                _fake_features(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    deterministic sampling grid from duration metadata; the decode of each
    frame is the stubbed codec above. Pure column expressions."""
    n = (F.col("duration_ms") / every_ms).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.transform(idx, lambda i: i * every_ms)).alias("frame_ts_ms"),
    )
