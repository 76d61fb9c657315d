"""Skew-handling and cardinality queries: salted join (result-identical
to the plain join — that IS the oracle), exact and approximate distinct
aggregation, and video frame-sampling registration."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.functions.numeric import dsum_expr, oracle_dsum
from sortify_spark.operators.skew import salted_equi_join
from sortify_spark.queries import register, _t


@register(
    "salted_join_revenue",
    f"""
    SELECT o_orderpriority,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    note="Skew-mitigated join: lineitem salted 8 ways on line number, "
    "orders replicated per salt — semantics identical to the plain "
    "equi-join (the oracle IS the plain join), but the shuffle of the "
    "big side is even under arbitrary key skew. AQE skew-split is the "
    "runtime fallback; salting is the plan-level tool "
    "(operators/skew.py).",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_equi_join(
        lineitem, orders, "l_orderkey", salt_from=F.col("l_linenumber")
    )
    return joined.groupBy("o_orderpriority").agg(
        dsum_expr("l_extendedprice * (1 - l_discount)").alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )


@register(
    "distinct_users_by_type",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS events
    FROM events GROUP BY event_type
    """,
    note="Distinct aggregation (absent in the reference, SURVEY.md §2.4 "
    "'absent' row): exact COUNT(DISTINCT) — expands to a two-phase "
    "partial-distinct plan in Spark.",
)
def q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("events"),
        )
    )


@register(
    "approx_distinct_users",
    None,  # HLL sketches are engine-specific; bounded-error rows-only
    note="The 100 TB path for cardinality: approx_count_distinct "
    "(HyperLogLog++, fixed memory per group) next to the exact twin "
    "distinct_users_by_type; rsd 1%.",
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias(
                "approx_distinct_users"
            )
        )
    )


@register(
    "activity_feed",
    """
    SELECT event_id,
           COALESCE(json_extract_string(props, '$.k'),
                    CAST(user_id AS VARCHAR)) AS activity_ref,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    note="J5: logs → activity-feed mapping — per-row transform with "
    "coalesce over nested details fields, timestamp-desc page "
    "(crud_dashboard.py:95-124).",
)
def q_activity_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select(
            "event_id",
            F.coalesce(
                F.get_json_object("props", "$.k"),
                F.col("user_id").cast("string"),
            ).alias("activity_ref"),
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


def _frame_sample_oracle() -> str:
    """DuckDB twin over the same synthetic media metadata: videos are
    every third item (i % 3 == 2) with n_frames = 30·(i % 5 + 1); frame
    indexes are every 10th, capped at 8 (DuckDB ``range`` excludes the
    stop, Spark ``sequence`` includes it — equivalent for step-aligned
    positive bounds)."""
    vids = ", ".join(
        f"('m{i}', {30 * (i % 5 + 1)})" for i in range(64) if i % 3 == 2
    )
    return f"""
    WITH v(media_id, n) AS (VALUES {vids})
    SELECT media_id,
           CAST(unnest(list_slice(range(0, n, 10), 1, 8)) AS INT)
               AS frame_index
    FROM v
    """


@register(
    "multimodal_frame_sample",
    _frame_sample_oracle(),
    note="Video frame sampling: metadata-driven (media_id, frame_index) "
    "explode — the Spark-side plumbing of a frame extractor (decode "
    "stubbed; multimodal.py); oracle re-derives the frames from the "
    "same metadata.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.multimodal import sample_frames, synthetic_media

    return sample_frames(synthetic_media(spark, 64), every_n=10, max_frames=8)


def _resize_oracle() -> str:
    """DuckDB twin over the same synthetic image metadata (images are
    i % 3 == 0 with w = 120+80·(i%5), h = 90+70·(i%7)): replay the
    integer aspect-fit and the stub's dimension-derived byte count."""
    imgs = ", ".join(
        f"('m{i}', {120 + 80 * (i % 5)}, {90 + 70 * (i % 7)})"
        for i in range(64)
        if i % 3 == 0
    )
    return f"""
    WITH img(media_id, w, h) AS (VALUES {imgs}),
    f AS (
      SELECT media_id, w, h,
             CASE WHEN w <= 256 AND h <= 256 THEN w
                  WHEN w >= h THEN 256
                  ELSE (w * 256) // h END AS ow,
             CASE WHEN w <= 256 AND h <= 256 THEN h
                  WHEN w >= h THEN (h * 256) // w
                  ELSE 256 END AS oh
      FROM img
    )
    SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
           CAST(GREATEST((ow * oh) // 64, 1) AS BIGINT) AS n_bytes_out
    FROM f
    """


@register(
    "multimodal_resize_plan",
    _resize_oracle(),
    note="Image resize stage: metadata dims → integer aspect-fit (no "
    "upscale) → per-batch resize kernel (stub; real resizer injectable "
    "via resize_images(resizer=...)). Output dims AND the stub's "
    "dimension-derived byte count are hash-checked; payload bytes "
    "stay executor-side (multimodal.py).",
)
def q_multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.multimodal import resize_images, synthetic_media

    return resize_images(synthetic_media(spark, 64), max_side=256).drop(
        "payload"
    )


def _audio_window_oracle() -> str:
    """DuckDB twin: audio items are i % 3 == 1 with sample_rate 16000,
    n_samples = 16000·(i%7+1); 250 ms windows → 4000 samples/window,
    count = ceil(ns/4000) capped at 12."""
    auds = ", ".join(
        f"('m{i}', {16000 * (i % 7 + 1)})" for i in range(64) if i % 3 == 1
    )
    return f"""
    WITH aud(media_id, ns) AS (VALUES {auds}),
    w AS (SELECT media_id, LEAST((ns + 3999) // 4000, 12) AS nw FROM aud)
    SELECT media_id,
           CAST(unnest(range(0, nw)) AS INT) AS window_index,
           CAST(unnest(range(0, nw)) * 4000 AS BIGINT) AS start_sample,
           CAST(4000 AS BIGINT) AS samples_per_window
    FROM w
    """


@register(
    "audio_window_plan",
    _audio_window_oracle(),
    note="Audio windowing stage: typed metadata (sample_rate, n_samples) "
    "→ (window_index, start_sample, samples_per_window) explode, derived "
    "JVM-side without touching payload bytes — the shape a PCM feature "
    "extractor consumes (multimodal.py; decode kernel injectable).",
)
def q_audio_window_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.multimodal import audio_windows, synthetic_media

    return audio_windows(synthetic_media(spark, 64), window_ms=250, max_windows=12)
