"""Retrieval-quality metrics (SURVEY.md F16, §5.3): Hit@k, MRR, nDCG@k,
and the composite score — as pure DataFrame expressions over ranked
result sets, so the engine's own evaluation harness runs distributed.

Reference definitions (``evaluation/evaluate_vector_retrieval.py:357-396,
500-507``): Hit@k = any relevant in top k; MRR = 1/rank of first relevant
(0 if none); nDCG@k = DCG/IDCG with log2 discount; composite =
0.6·MRR + 0.4·Hit@5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "is_relevant",
    total_relevant_col: str = "total_relevant",
    ks: tuple[int, ...] = (1, 3, 5, 10),
    ndcg_k: int = 10,
) -> DataFrame:
    """Per-query metrics from a ranked result table.

    Input: one row per (query, result) with a 1-based ``rank``, a 0/1
    ``is_relevant`` flag, and the per-query count of relevant docs in the
    corpus (for the IDCG denominator).  One hash aggregate per query —
    no window needed because rank is already materialized.
    """
    rel = F.col(rel_col).cast("double")
    rank = F.col(rank_col)
    hits = [
        F.max(F.when((rank <= k) & (rel == 1.0), 1).otherwise(0)).alias(
            f"hit_{k}"
        )
        for k in ks
    ]
    first_rel_rank = F.min(F.when(rel == 1.0, rank))
    mrr = F.round(
        F.coalesce(1.0 / first_rel_rank, F.lit(0.0)), 6
    ).alias("mrr")
    dcg = F.sum(
        F.when(rank <= ndcg_k, rel / F.log2(rank + 1)).otherwise(0.0)
    )
    # IDCG over min(total_relevant, k) ideal positions.
    r = F.least(F.first(F.col(total_relevant_col)), F.lit(ndcg_k))
    # Σ_{i=1..r} 1/log2(i+1) has no closed form; build it as a literal
    # expression over the bounded k (ndcg_k ≤ 10 ⇒ 10-term CASE-free sum).
    idcg = sum(
        (F.when(r >= i, 1.0 / F.log2(F.lit(float(i + 1)))).otherwise(0.0))
        for i in range(1, ndcg_k + 1)
    )
    ndcg = F.round(
        F.when(idcg > 0, dcg / idcg).otherwise(0.0), 6
    ).alias(f"ndcg_{ndcg_k}")
    out = ranked.groupBy(query_col).agg(*hits, mrr, ndcg)
    return out.withColumn(
        "composite",
        F.round(0.6 * F.col("mrr") + 0.4 * F.col("hit_5"), 6),
    )


def idcg_sql(r_expr: str, ndcg_k: int = 10) -> str:
    """DuckDB twin of the bounded IDCG sum."""
    terms = " + ".join(
        f"CASE WHEN {r_expr} >= {i} THEN 1.0 / log2({i + 1}.0) ELSE 0.0 END"
        for i in range(1, ndcg_k + 1)
    )
    return f"({terms})"
