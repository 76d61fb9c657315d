"""Retrieval-evaluation + clustering-derivation queries with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sortify_spark.metrics import idcg_sql, retrieval_metrics
from sortify_spark.queries import register, _t
from sortify_spark.functions.vectors import cosine_given_norms, l2_norm

_N_PROBES = 5

#: Ranked result set: for each probe vector (vec_id < 5), every other
#: vector ranked by cosine; relevance = same label.
_RANKED_SQL = f"""
  WITH probes AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
           label AS qlabel
    FROM embeddings WHERE vec_id < {_N_PROBES}
  ),
  scored AS (
    SELECT p.query_id, e.vec_id AS id,
           CASE WHEN e.label = p.qlabel THEN 1 ELSE 0 END AS is_relevant,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.qe), 6)
               AS score
    FROM embeddings e, probes p
    WHERE e.vec_id <> p.query_id
  ),
  ranked AS (
    SELECT query_id, id, is_relevant, score,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, id ASC) AS rank
    FROM scored
  ),
  rel_totals AS (
    SELECT query_id, SUM(is_relevant) AS total_relevant
    FROM ranked GROUP BY query_id
  )
  SELECT r.query_id, r.id, r.is_relevant, r.rank, t.total_relevant
  FROM ranked r JOIN rel_totals t USING (query_id)
  WHERE r.rank <= 10
"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _RANKED_SQL: multi-probe knn with relevance flags.

    One scan of embeddings joined against the broadcast 5-row probe set —
    the multi-query batch-scoring shape (every probe scored in one pass,
    not a loop of scans).
    """
    emb = _t(spark, sf_dir, "embeddings")
    probes = F.broadcast(
        emb.filter(F.col("vec_id") < _N_PROBES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("label").alias("qlabel"),
        )
        .withColumn("__qn", l2_norm("qe"))
    )
    scored = (
        # Norms folded once per side below the join (N + M folds), not per
        # pair (2·N·M) — the folds are interpreted, so this dominates cost.
        emb.withColumn("__en", l2_norm("embedding"))
        .crossJoin(probes)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("id"),
            F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias(
                "is_relevant"
            ),
            F.round(
                cosine_given_norms(
                    F.col("embedding"), F.col("qe"), F.col("__en"), F.col("__qn")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    totals = ranked.groupBy("query_id").agg(
        F.sum("is_relevant").alias("total_relevant")
    )
    return ranked.join(totals, "query_id").filter(F.col("rank") <= 10)


@register(
    "retrieval_metrics",
    f"""
    WITH ranked AS ({_RANKED_SQL})
    SELECT query_id,
           MAX(CASE WHEN rank <= 1 AND is_relevant = 1 THEN 1 ELSE 0 END) AS hit_1,
           MAX(CASE WHEN rank <= 3 AND is_relevant = 1 THEN 1 ELSE 0 END) AS hit_3,
           MAX(CASE WHEN rank <= 5 AND is_relevant = 1 THEN 1 ELSE 0 END) AS hit_5,
           MAX(CASE WHEN rank <= 10 AND is_relevant = 1 THEN 1 ELSE 0 END) AS hit_10,
           ROUND(COALESCE(1.0 / MIN(CASE WHEN is_relevant = 1 THEN rank END), 0.0), 6)
               AS mrr,
           ROUND(CASE WHEN {idcg_sql('least(ANY_VALUE(total_relevant), 10)')} > 0
                      THEN SUM(CASE WHEN rank <= 10
                                    THEN CAST(is_relevant AS DOUBLE) / log2(rank + 1)
                                    ELSE 0.0 END)
                           / {idcg_sql('least(ANY_VALUE(total_relevant), 10)')}
                      ELSE 0.0 END, 6) AS ndcg_10,
           ROUND(0.6 * ROUND(COALESCE(1.0 / MIN(CASE WHEN is_relevant = 1 THEN rank END), 0.0), 6)
                 + 0.4 * MAX(CASE WHEN rank <= 5 AND is_relevant = 1 THEN 1 ELSE 0 END), 6)
               AS composite
    FROM ranked GROUP BY query_id
    """,
    note="F16/§5.3: Hit@{{1,3,5,10}}, MRR, nDCG@10, composite "
    "0.6·MRR+0.4·Hit@5 per probe query — the reference's offline eval "
    "harness (evaluate_vector_retrieval.py:357-396,500-507) as one "
    "distributed aggregate over a multi-probe knn.",
)
def q_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retrieval_metrics(_ranked(spark, sf_dir))


@register(
    "cluster_confidence",
    """
    WITH sizes AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    )
    SELECT label, n,
           ROUND(least(0.95, 0.5 + CAST(n AS DOUBLE) / 100), 4) AS confidence
    FROM sizes
    """,
    note="F14: cluster confidence min(0.5 + n/100, 0.95) "
    "(clustering_service.py:908-909) derived from group sizes.",
)
def q_cluster_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "n",
            F.round(
                F.least(F.lit(0.95), 0.5 + F.col("n").cast("double") / 100), 4
            ).alias("confidence"),
        )
    )


@register(
    "cluster_keyword_labels",
    """
    WITH toks AS (
      SELECT e.label, unnest(string_split(d.text, ' ')) AS token
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    freq AS (
      SELECT label, token, COUNT(*) AS freq FROM toks
      WHERE token <> '' GROUP BY label, token
    ),
    top3 AS (
      SELECT label, token, freq FROM freq
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY label ORDER BY freq DESC, token ASC) <= 3
    )
    SELECT label,
           substring(string_agg(token, ' · ' ORDER BY freq DESC, token ASC),
                     1, 30) AS cluster_name
    FROM top3 GROUP BY label
    """,
    note="F15+M3 fallback: cluster naming from top-3 keyword frequencies, "
    "' · '-joined, 30-char cap (clustering_service.py:821-827,833-865).",
)
def q_cluster_keyword_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    toks = docs.join(emb, "doc_id").select(
        "label", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("label").orderBy(
        F.col("freq").desc(), F.col("token").asc()
    )
    top3 = freq.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    # Deterministic ordered join: sort (freq desc, token) via sortable struct.
    return (
        top3.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct((-F.col("freq")).alias("nf"), "token"))
            ).alias("pairs")
        )
        .select(
            "label",
            F.substring(
                F.array_join(
                    F.transform(F.col("pairs"), lambda p: p.getField("token")),
                    " · ",
                ),
                1,
                30,
            ).alias("cluster_name"),
        )
    )


@register(
    "log_filter_page",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           ROUND(value, 2) AS value_r
    FROM events
    WHERE event_type = 'error'
      AND contains(lower(props), '"k"')
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY ts DESC, event_id DESC
    LIMIT 50
    """,
    note="P2+O3: log filter builder — level equality, message icontains, "
    "timestamp BETWEEN, timestamp-desc page (crud_logs.py:41-66,67).",
)
def q_log_filter_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.operators.filters import icontains

    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "error")
            & icontains("props", '"k"')
            & (F.col("ts") >= F.to_timestamp(F.lit("2024-01-05 00:00:00")))
            & (F.col("ts") <= F.to_timestamp(F.lit("2024-01-20 00:00:00")))
        )
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(50)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.round("value", 2).alias("value_r"),
        )
    )
