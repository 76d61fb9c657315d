"""The write path (SURVEY.md §3.4): ingest → chunk → embed → vectors.

Reference pipeline (``semantic_summary_service.py:257-431``): delete old
vectors → summary text (F5) → summary vector → chunks (F2) → chunk
embeddings (F7, batch 32) → batch insert (S9) → status update.  Here it
is ONE DataFrame job: the summary branch and the exploded chunk branch
union into the vectors-table schema, embeddings computed by the
Arrow-batched stub encoder (swap for a real model UDF at will).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sortify_spark.functions.text import (
    DEFAULT_CHUNK_SIZE,
    DEFAULT_OVERLAP,
    explode_chunks,
    truncate_col,
)
from sortify_spark.functions.vectors import hash_embed_udf

SUMMARY_MAX_CHARS = 512  # reference embedding input truncation


def ingest_vectorize(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    owner_col: str | None = None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    dim: int = 64,
) -> DataFrame:
    """documents → vectors-table rows (1 summary + N chunk vectors per
    doc, ``vector_db_service.py:112-126``).

    Plan shape: two branches off one scan — summary (truncate → embed)
    and chunks (UDF explode → embed) — unioned by name.  The encoder runs
    once per output row over Arrow batches; at scale this is the job you
    partition by date/owner and run incrementally (see
    streaming.vectorize_stream for the same plan under foreachBatch).
    """
    embed = hash_embed_udf(dim)

    def owner_expr():
        return (
            F.col(owner_col).cast("string") if owner_col else F.lit("default")
        )

    summary = documents.select(
        F.col(id_col).cast("string").alias("document_id"),
        owner_expr().alias("owner_id"),
        F.lit("summary").alias("vtype"),
        F.lit(0).alias("chunk_index"),
        F.lit(1).alias("total_chunks"),
        truncate_col(F.col(text_col), SUMMARY_MAX_CHARS).alias("chunk_text"),
    )
    chunks = explode_chunks(
        documents,
        id_col,
        text_col,
        chunk_size,
        overlap,
        carry_cols=(owner_col,) if owner_col else (),
    ).select(
        F.col(id_col).cast("string").alias("document_id"),
        owner_expr().alias("owner_id"),
        F.lit("chunk").alias("vtype"),
        F.col("chunk_index"),
        F.col("total_chunks"),
        F.col("chunk_text"),
    )
    unioned = summary.unionByName(chunks)
    return unioned.select(
        F.concat_ws("#", "document_id", "vtype", F.col("chunk_index").cast("string")).alias(
            "vector_id"
        ),
        "document_id",
        "owner_id",
        "vtype",
        "chunk_index",
        "total_chunks",
        "chunk_text",
        embed(F.col("chunk_text")).alias("embedding"),
    )


def delete_vectors_for_docs(
    vectors: DataFrame, doc_ids: DataFrame, key: str = "document_id"
) -> DataFrame:
    """S10: vector delete by document id — anti-join rewrite of
    ``collection.delete(where={document_id})``
    (``vector_db_service.py:263-323``); with Delta this is a DELETE."""
    return vectors.join(F.broadcast(doc_ids), on=key, how="left_anti")


def refresh_vectors(
    vectors: DataFrame, documents: DataFrame, id_col: str = "doc_id", **kw
) -> DataFrame:
    """Delete-then-append re-vectorization of changed docs — the
    reference's per-doc update loop as one set-level job."""
    ids = documents.select(F.col(id_col).cast("string").alias("document_id"))
    kept = delete_vectors_for_docs(vectors, ids)
    return kept.unionByName(ingest_vectorize(documents, id_col=id_col, **kw))
