"""Bucketed co-located join: same-key bucketed tables must join with
ZERO shuffle exchanges — the layout that amortizes the join shuffle at
100 TB."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from sortify_spark.sources.sinks import write_bucketed
from sortify_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    stats = docs.select(
        "doc_id", (F.col("n_chars") > 200).alias("is_long")
    )
    write_bucketed(docs, "b_docs", "doc_id", num_buckets=8)
    write_bucketed(stats, "b_stats", "doc_id", num_buckets=8)
    try:
        a = spark.table("b_docs")
        b = spark.table("b_stats")
        # Force a non-broadcast join so the bucket layout is what saves
        # the shuffle, then verify both correctness and the plan.
        joined = a.hint("merge").join(b, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_shuffles == 0, plan
        assert joined.count() == docs.count()
        # Same-key aggregation also reuses the bucketing (no Exchange).
        agg = a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert (
            agg_plan.count("Exchange") - agg_plan.count("BroadcastExchange")
            == 0
        ), agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


@pytest.mark.slow
def test_semdedup_over_bucketed_embeddings_no_shuffle(spark):
    """SemDeDup's only wide dependency is the group-by-label handoff to
    the per-block kernel.  With the embeddings table bucketed BY label,
    that distribution is already satisfied at read time — the BLAS
    kernel's applyInPandas must run with ZERO shuffle exchanges, which
    is the 100-TB layout: bucket the vector store once, run semantic
    dedup forever without moving a vector."""
    from sortify_spark.queries_curation2 import semdedup_stats_np

    emb = load_table(spark, SF_DIR, "embeddings")
    write_bucketed(emb, "b_emb", "label", num_buckets=8)
    try:
        out = semdedup_stats_np(spark.table("b_emb"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        # the final orderBy is a cosmetic range exchange over 10 rows;
        # the kernel itself must add none
        kernel_plan = plan.split("Sort")[-1]
        assert "FlatMapGroupsInPandas" in plan
        assert (
            kernel_plan.count("Exchange")
            - kernel_plan.count("BroadcastExchange")
            == 0
        ), plan
        assert n_shuffles <= 1, plan
        # and it still computes the same answer as the unbucketed path
        a = [tuple(r) for r in semdedup_stats_np(emb).collect()]
        b = [tuple(r) for r in out.collect()]
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS b_emb")
