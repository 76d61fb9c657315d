"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / frame-sample stages as
Arrow-batched ``mapInPandas`` operators.

The media libraries are not in this container, so the decode kernels are
STUBS — a clearly-marked ``NotImplementedError`` for real decoding plus a
deterministic fake used by tests — but the Spark-side plumbing (schema,
partitioning, UDF signatures, batch shapes) is real and is what a 100 TB
media pipeline needs: binary payloads never leave the executor, features
come back as fixed-width arrays, and each stage is a narrow map.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; inject a real kernel via extract_features(decoder=...)"
    )


def fake_decode(payload: bytes | None) -> np.ndarray:
    """Deterministic stand-in: sha256-seeded pseudo-features, so pipeline
    tests are exactly reproducible without media libs."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(
    media: DataFrame, decoder=fake_decode, batch_hint: int | None = None
) -> DataFrame:
    """media → fixed-width feature rows via ``mapInPandas``.

    The iterator-of-batches signature is the part that matters at scale:
    payload bytes stream through Arrow batch by batch, the decoder sees
    one batch's payloads at a time, and nothing is collected."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in decoder(p)] if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    par = media.sparkSession.sparkContext.defaultParallelism
    return media.repartition(par).mapInPandas(_extract, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling (stub): emits (media_id, frame_index) rows for
    the frames a real decoder would extract — the explode shape of the
    stage.  Frame count is derived from metadata (``meta['n_frames']``),
    so the plan is testable without decoding."""
    n = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    # n == 0 (missing/zero n_frames) must yield NO frames, not a phantom
    # frame 0 — sequence(0, greatest(n-1, 0)) would emit [0] for n=0.
    idx = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.slice(idx, 1, max_frames)).alias("frame_index"),
        )
    )


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic in-memory media table for tests/benchmarks."""
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (i % 7 + 1)
        rows.append(
            (
                f"m{i}",
                mtype,
                bytearray(payload),
                {"n_frames": str(30 * (i % 5 + 1))} if mtype == "video" else {},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
