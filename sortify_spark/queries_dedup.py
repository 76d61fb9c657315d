"""Dedup *resolution* queries — not just finding duplicates but emitting
the kept corpus, the operation a training-data pipeline actually runs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark import dedup
from sortify_spark import textstats as ts
from sortify_spark.queries import register, _t

_FP = ts.FINGERPRINT_SQL.format(t="text")


@register(
    "dedup_keep_representative",
    f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY {_FP}
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    note="Exact dedup resolution: keep the lowest-id representative per "
    "content fingerprint — one partitioned row_number window, the "
    "distributed form of hash-groupBy dedup (dedup.py).",
)
def q_dedup_keep_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = dedup.drop_exact_duplicates(_t(spark, sf_dir, "documents"))
    return kept.select("doc_id", "lang", "n_chars")


@register(
    "corpus_after_neardup",
    f"""
    WITH pairs AS ({dedup.minhash_lsh_oracle_sql(threshold=0.5, shingle_k=3)})
    SELECT doc_id, lang FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """,
    note="Near-dup resolution end-to-end: MinHash-LSH verified pairs → "
    "greedy drop of each pair's higher id → kept corpus as one "
    "anti-join (no iterative connected components).",
)
def q_corpus_after_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, use_shingles=3)
    return dedup.drop_near_duplicates(docs, pairs).select("doc_id", "lang")
