"""Bucketed co-located join: same-key bucketed tables must join with
ZERO shuffle exchanges — the layout that amortizes the join shuffle at
100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F

from sortify_spark.sources.sinks import write_bucketed
from sortify_spark.tables import load_table
from tests.conftest import SF_DIR


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
