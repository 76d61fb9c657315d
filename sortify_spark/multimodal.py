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


def fit_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit into a max_side box, never upscaling —
    integer-only arithmetic so an SQL oracle replays it exactly."""
    if w <= max_side and h <= max_side:
        return w, h
    if w >= h:
        return max_side, (h * max_side) // w
    return (w * max_side) // h, max_side


def fake_resize(payload: bytes | None, out_w: int, out_h: int) -> bytes:
    """Deterministic resize stand-in: (out_w·out_h)//64 pseudo-pixel
    bytes derived from the payload hash — byte COUNT is pure dimension
    arithmetic (SQL-replayable), byte CONTENT is payload-deterministic."""
    n = max((out_w * out_h) // 64, 1)
    seed = hashlib.sha256(bytes(payload or b"")).digest()
    return (seed * (n // len(seed) + 1))[:n]


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("n_bytes_out", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 256, resizer=fake_resize
) -> DataFrame:
    """Image resize stage: metadata width/height → aspect-fit target dims
    → per-batch resize kernel (real decoder/resizer injectable; the
    deterministic stub stands in here).  Same scale shape as
    :func:`extract_features`: payload bytes stream executor-side through
    Arrow, one narrow map, no shuffle, no collect."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                meta = meta or {}
                w, h = int(meta.get("width", 0)), int(meta.get("height", 0))
                ow, oh = fit_dims(w, h, max_side) if w > 0 and h > 0 else (0, 0)
                resized = resizer(payload, ow, oh) if ow and oh else None
                out_rows["media_id"].append(mid)
                out_rows["width"].append(w)
                out_rows["height"].append(h)
                out_rows["out_w"].append(ow)
                out_rows["out_h"].append(oh)
                out_rows["n_bytes_out"].append(
                    len(resized) if resized is not None else 0
                )
                out_rows["payload"].append(resized)
            yield pd.DataFrame(out_rows)

    par = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.filter(F.col("media_type") == "image")
        .repartition(par)
        .mapInPandas(_resize, RESIZE_SCHEMA)
    )


def audio_windows(
    media: DataFrame, window_ms: int = 250, max_windows: int = 12
) -> DataFrame:
    """Audio windowing stage: metadata (sample_rate, n_samples) →
    (window_index, start_sample, samples_per_window) rows — the explode
    shape a PCM feature extractor consumes, derived JVM-side from typed
    metadata without touching payload bytes (the decode itself is the
    injectable kernel, as in :func:`extract_features`)."""
    a = media.filter(F.col("media_type") == "audio").select(
        "media_id",
        F.element_at(F.col("meta"), "sample_rate").cast("long").alias("sr"),
        F.element_at(F.col("meta"), "n_samples").cast("long").alias("ns"),
    )
    a = (
        a.withColumn("spw", F.expr(f"(sr * {window_ms}) div 1000"))
        .filter((F.col("spw") > 0) & (F.col("ns") > 0))
        .withColumn(
            "nw",
            F.least(F.expr("(ns + spw - 1) div spw"), F.lit(max_windows)),
        )
    )
    return a.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("nw") - 1).cast("int"))
        ).alias("window_index"),
        "spw",
    ).select(
        "media_id",
        "window_index",
        (F.col("window_index") * F.col("spw")).alias("start_sample"),
        F.col("spw").alias("samples_per_window"),
    )


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic in-memory media table for tests/benchmarks.  Typed
    metadata per modality: images carry width/height (some under, some
    over the resize box), audio carries sample_rate/n_samples, video
    carries n_frames — each stage's oracle re-derives from the same
    formulas."""
    # Queries over synthetic media never touch tables.load_table, so the
    # executor-side package bootstrap (needed by the mapInPandas kernels
    # when the driver found the package via a bare sys.path entry) must
    # happen here.
    from sortify_spark._bootstrap import ensure_worker_imports

    ensure_worker_imports(spark)
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (i % 7 + 1)
        if mtype == "video":
            meta = {"n_frames": str(30 * (i % 5 + 1))}
        elif mtype == "image":
            meta = {
                "width": str(120 + 80 * (i % 5)),
                "height": str(90 + 70 * (i % 7)),
            }
        else:
            meta = {
                "sample_rate": "16000",
                "n_samples": str(16000 * (i % 7 + 1)),
            }
        rows.append((f"m{i}", mtype, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
