"""Window / ranking operators (SURVEY.md §2.5, W1-W7).

The reference ranks in Python lists (sort + enumerate + seen-sets); each
pattern maps to one Spark window.  Every window here carries an explicit
deterministic tie-breaker — the reference inherits dict/sort stability,
Spark must declare it (SURVEY.md §7.3 hard-part #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_by(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """W1: global 1-based rank over a sorted list
    (``enhanced_search_service.py:403``).

    Scale note: a global row_number needs a single-partition window — fine
    for the top-k-bounded result lists it is applied to (k ≤ 100), never
    applied to unbounded tables.
    """
    w = Window.orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w))


def best_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
) -> DataFrame:
    """W2/W3/SO3: keep the best row per group — best chunk per document
    (``enhanced_search_service.py:406-419``), order-aware dedup
    (``:508-548``), latest job per user W7
    (``clustering_service.py:1083-1086``).

    One shuffle on the group key; AQE handles skewed groups.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topn_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-N rows per group with the rank kept (generalizes W2)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def keep_max_merge(
    df: DataFrame,
    key_col: str,
    score_col: str,
    carry_cols: list[str],
) -> DataFrame:
    """W4/W5: union-of-sources merge keeping the max-scored row per key
    (``search_weight_config.py:35-54``, ``qa_search_coordinator.py:256-269``).

    Implemented as max_by-style aggregation (single shuffle, no window):
    deterministic tie-break on (score desc, key asc) via struct ordering.
    """
    ordered = F.struct(
        F.col(score_col).alias("s"), *[F.col(c).alias(c) for c in carry_cols]
    )
    return (
        df.groupBy(key_col)
        .agg(F.max(ordered).alias("__best"))
        .select(
            key_col,
            F.col("__best.s").alias(score_col),
            *[F.col(f"__best.{c}").alias(c) for c in carry_cols],
        )
    )
