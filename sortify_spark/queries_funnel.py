"""Ordered funnel conversion over the event stream.

The classic product-analytics operator the reference's dashboard layer
approximates with separate counts (`crud_dashboard.py:24-35` counts
stages independently): how many users progress through
``view -> click -> purchase`` in STRICT event-time order — a click only
counts after that user's first view, a purchase only after that
qualifying click.  Independent stage counts overstate conversion
whenever users act out of order; the ordered funnel is the honest
number.

Shape (the part that matters at 100 TB): the three "first timestamp
after the previous step" columns are three consecutive
``Window.partitionBy(user_id)`` aggregates — Catalyst plans ONE hash
exchange for all three (same partitioning, reused), the per-user
collapse reuses it again, and the final 3-row summary is a broadcast-
size aggregate.  The event stream is shuffled exactly once, by user —
the same key any sessionization already clusters by, so in a pipeline
the exchange is typically already there.

Determinism: steps are MIN(timestamp) under a filter (no ties matter —
min is order-free); conversion rates and mean time-to-step are single
IEEE divisions over exact bigint microsecond sums with DECIMAL
accumulation (`functions/numeric.py` contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sortify_spark.queries import register, _t

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_HORIZON_DAYS = 7  #: conversion window: steps must land within
#: this span of the first view (the Amplitude/Mixpanel-style window —
#: without it any sufficiently long event history converges to 100%)
_DEC = "decimal(38,6)"


def _rate(num: str, den: str, digits: int) -> str:
    """Division guarded against a zero denominator with IDENTICAL text
    on both engines: Spark's ``Divide`` yields NULL for 0/0 while
    DuckDB's IEEE double division yields NaN, so an empty funnel (zero
    step-1 users) would hash-diverge without the guard (ADVICE r7)."""
    return (
        f"CASE WHEN {den} = 0 THEN NULL "
        f"ELSE ROUND(CAST({num} AS DOUBLE) / {den}, {digits}) END"
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """3 rows — (step, step_name, users, conv_from_first,
    avg_us_from_first): users reaching each ordered step, conversion
    vs step 1, mean microseconds from first view among reachers."""
    w = Window.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STEPS
    e = events.select("user_id", "event_type", "ts")
    e = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w)
    )
    horizon = F.col("t1") + F.expr(
        f"INTERVAL {FUNNEL_HORIZON_DAYS} DAYS"
    )
    e = e.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == s2)
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= horizon),
                F.col("ts"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == s3)
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= horizon),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    agg = per_user.agg(
        F.count(F.col("t1")).alias("u1"),
        F.count(F.col("t2")).alias("u2"),
        F.count(F.col("t3")).alias("u3"),
        F.sum(
            F.when(
                F.col("t2").isNotNull(),
                (F.unix_micros("t2") - F.unix_micros("t1")).cast(_DEC),
            )
        ).alias("d2"),
        F.sum(
            F.when(
                F.col("t3").isNotNull(),
                (F.unix_micros("t3") - F.unix_micros("t1")).cast(_DEC),
            )
        ).alias("d3"),
    )
    return agg.selectExpr(
        f"""stack(3,
             1, '{s1}', u1, {_rate('u1', 'u1', 6)},
                CAST(0.0 AS DOUBLE),
             2, '{s2}', u2, {_rate('u2', 'u1', 6)},
                {_rate('d2', 'u2', 3)},
             3, '{s3}', u3, {_rate('u3', 'u1', 6)},
                {_rate('d3', 'u3', 3)}
           ) AS (step, step_name, users, conv_from_first,
                 avg_us_from_first)"""
    ).orderBy("step")


_FUNNEL_SQL = f"""
WITH u1 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END) AS t1
  FROM events GROUP BY user_id
),
u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > u1.t1
    AND e.ts <= u1.t1 + INTERVAL {FUNNEL_HORIZON_DAYS} DAY
  GROUP BY e.user_id
),
u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e
  JOIN u2 ON e.user_id = u2.user_id
  JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > u2.t2
    AND e.ts <= u1.t1 + INTERVAL {FUNNEL_HORIZON_DAYS} DAY
  GROUP BY e.user_id
),
per_user AS (
  SELECT u1.user_id, u1.t1, u2.t2, u3.t3
  FROM u1
  LEFT JOIN u2 ON u1.user_id = u2.user_id
  LEFT JOIN u3 ON u1.user_id = u3.user_id
),
agg AS (
  SELECT COUNT(t1) AS u1, COUNT(t2) AS u2, COUNT(t3) AS u3,
         SUM(CASE WHEN t2 IS NOT NULL THEN
             CAST(epoch_us(t2) - epoch_us(t1) AS DECIMAL(38,6)) END) AS d2,
         SUM(CASE WHEN t3 IS NOT NULL THEN
             CAST(epoch_us(t3) - epoch_us(t1) AS DECIMAL(38,6)) END) AS d3
  FROM per_user
)
SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_name, u1 AS users,
       {_rate('u1', 'u1', 6)} AS conv_from_first,
       CAST(0.0 AS DOUBLE) AS avg_us_from_first
FROM agg
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', u2, {_rate('u2', 'u1', 6)},
       {_rate('d2', 'u2', 3)}
FROM agg
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', u3, {_rate('u3', 'u1', 6)},
       {_rate('d3', 'u3', 3)}
FROM agg
ORDER BY step
"""


@register(
    "funnel_conversion",
    _FUNNEL_SQL,
    note="Ordered funnel view -> click -> purchase in strict event-time "
    "order (a click counts only after that user's first view, a "
    "purchase only after that qualifying click) within a "
    f"{FUNNEL_HORIZON_DAYS}-day conversion window of the first view: "
    "users per step, conversion vs step 1, mean microseconds from "
    "first view.  Three same-partitioning window aggregates + the "
    "per-user collapse share ONE hash exchange of the event stream; "
    "rates are single IEEE divisions over DECIMAL-accumulated exact "
    "microsecond sums.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_conversion(_t(spark, sf_dir, "events"))
