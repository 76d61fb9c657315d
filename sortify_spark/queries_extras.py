"""Beyond-reference relational capabilities that Spark provides for free
(SURVEY.md §2.4 'absent' row): rollup/grouping sets, intersect, sampled
scans, and the A12 evaluation-summary aggregate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.functions.numeric import dsum, oracle_dsum
from sortify_spark.queries import register, _t


@register(
    "orders_rollup",
    f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS cnt,
           {oracle_dsum('o_totalprice')} AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    note="Beyond-reference: ROLLUP hierarchy totals (status → priority → "
    "grand total) in one pass — free in Spark, absent in the reference's "
    "Mongo pipelines (SURVEY.md §2.4).",
)
def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "priority"
            ),
            "cnt",
            "total_value",
        )
    )


@register(
    "set_intersection_custkeys",
    """
    SELECT COUNT(*) AS both_status_customers FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
    note="SO2 complement: INTERSECT of result sources (the reference "
    "computes `both = ∩` for fusion stats, "
    "enhanced_search_service.py:491-496).",
)
def q_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return a.intersect(b).agg(
        F.count(F.lit(1)).alias("both_status_customers")
    )


def _metrics_summary_oracle() -> str:
    from sortify_spark.queries import REGISTRY

    per_query = REGISTRY["retrieval_metrics"].sql
    return f"""
    WITH per_query AS ({per_query})
    SELECT ROUND(AVG(hit_1), 6) AS avg_hit_1,
           ROUND(AVG(hit_5), 6) AS avg_hit_5,
           ROUND(AVG(hit_10), 6) AS avg_hit_10,
           ROUND(AVG(mrr), 6) AS avg_mrr,
           ROUND(AVG(ndcg_10), 6) AS avg_ndcg_10,
           ROUND(AVG(composite), 6) AS avg_composite,
           COUNT(*) AS n_queries
    FROM per_query
    """


@register(
    "metrics_summary",
    _metrics_summary_oracle(),
    note="A12: evaluation-run aggregation — mean of per-case metric rows "
    "(evaluate_vector_retrieval.py:418-470's pandas mean as a Spark "
    "aggregate over the oracle-checked retrieval_metrics output; the "
    "oracle wraps the per-query oracle in the same outer mean).",
)
def q_metrics_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.queries_metrics import q_retrieval_metrics

    per_query = q_retrieval_metrics(spark, sf_dir)
    return per_query.agg(
        F.round(F.avg("hit_1"), 6).alias("avg_hit_1"),
        F.round(F.avg("hit_5"), 6).alias("avg_hit_5"),
        F.round(F.avg("hit_10"), 6).alias("avg_hit_10"),
        F.round(F.avg("mrr"), 6).alias("avg_mrr"),
        F.round(F.avg("ndcg_10"), 6).alias("avg_ndcg_10"),
        F.round(F.avg("composite"), 6).alias("avg_composite"),
        F.count(F.lit(1)).alias("n_queries"),
    )


@register(
    "sampled_scan",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
          % 10 = 0
    """,
    note="O7: deterministic ~10% sample via a portable content-hash "
    "predicate (clustering_service.py:723-725 uses random.sample) — "
    "hash-sampling beats seeded Bernoulli for pipelines because the "
    "sample is stable under repartitioning and re-runs, and it is "
    "oracle-checkable. df.sample(seed=) remains the one-off variant.",
)
def q_sampled_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    return (
        _t(spark, sf_dir, "documents")
        .filter(bucket == 0)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "status_year_cube",
    f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
           COUNT(*) AS cnt,
           {oracle_dsum('o_totalprice')} AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    """,
    note="Beyond-reference (SURVEY.md §2.4 'absent' row, with "
    "orders_rollup): full CUBE over (status, order year) — all four "
    "grouping combinations in one shuffle via Spark's Expand operator, "
    "where the reference would need four Mongo pipelines.",
)
def q_status_year_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube(
            F.col("o_orderstatus"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(
                F.col("order_year").cast("string"), F.lit("ALL")
            ).alias("order_year"),
            "cnt",
            "total_value",
        )
    )


@register(
    "daily_order_delta",
    """
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS cnt
      FROM orders GROUP BY 1
    )
    SELECT day, cnt,
           COALESCE(cnt - LAG(cnt) OVER (ORDER BY day), 0) AS delta_prev,
           COALESCE(LEAD(cnt) OVER (ORDER BY day) - cnt, 0) AS delta_next
    FROM daily
    """,
    note="lead/lag window functions (absent in the reference, SURVEY.md "
    "§2.5 'absent' row): day-over-day order-count deltas. Integer "
    "deltas are oracle-exact; the unpartitioned window is safe because "
    "the input is already one row per day (~2.4k rows), not per order.",
)
def q_daily_order_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "cnt",
        F.coalesce(
            F.col("cnt") - F.lag("cnt").over(w), F.lit(0)
        ).alias("delta_prev"),
        F.coalesce(
            F.lead("cnt").over(w) - F.col("cnt"), F.lit(0)
        ).alias("delta_next"),
    )


@register(
    "qa_document_search",
    None,
    note="§3.3 end-to-end QA data plane: rule-based intent classification "
    "→ ≤2 rewritten variants → per-variant facade search → weighted "
    "keep-max merge (V6). LLM stages are deterministic stubs (§2.12).",
)
def q_qa_document_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.facade import get_engine
    from sortify_spark.qa import answer_question

    eng = get_engine(spark, sf_dir, dim=16)
    res = answer_question(eng, "find documents about data query join")
    return res.results


# --- Z-order layout kernel (operators/zorder.py): the Morton-key
# arithmetic that drives multi-dimensional data skipping, hash-checked
# per cell.  The layout's pruning effect is asserted by
# tests/test_zorder.py over parquet footer statistics; this query pins
# the KEY computation itself to a DuckDB replay so the curve cannot
# silently drift (a wrong interleave still "works" — it just stops
# clustering — so only a value check catches it).

from sortify_spark.operators.zorder import (  # noqa: E402
    grid_coord,
    grid_coord_sql,
    zvalue,
    zvalue_sql,
)

_ZC_X_SQL = grid_coord_sql("user_id", 0, 1024)
_ZC_Y_SQL = grid_coord_sql(
    "EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)", 0, 1440
)

_ZORDER_CELLS_SQL = f"""
WITH g AS (
  SELECT {zvalue_sql(_ZC_X_SQL, _ZC_Y_SQL)} AS z FROM events
)
SELECT (z >> 22) AS cell, COUNT(*) AS cnt,
       MIN(z) AS min_z, MAX(z) AS max_z
FROM g GROUP BY 1
"""


@register(
    "zorder_cells",
    _ZORDER_CELLS_SQL,
    note="Z-order layout kernel: Morton keys of (user_id, minute-of-day) "
    "on a 16-bit grid, aggregated per 1024-key cell.  Pure codegen "
    "shift/mask arithmetic (operators/zorder.py) replayed bit-for-bit "
    "in DuckDB; the layout writer (write_zordered) reuses exactly this "
    "key.  Scale: one narrow projection + one groupBy — the layout "
    "job itself is one range shuffle, the price of any sort layout.",
)
def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = grid_coord(F.col("user_id"), 0, 1024)
    y = grid_coord(F.hour("ts") * 60 + F.minute("ts"), 0, 1440)
    return (
        ev.select(zvalue(x, y).alias("z"))
        .groupBy(F.shiftright(F.col("z"), 22).alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
        )
    )
