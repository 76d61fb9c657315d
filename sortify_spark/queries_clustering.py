"""Clustering pipeline queries (M1-M5).  The k-means kernel is not
SQL-expressible, so these are rows-only driver checks; the contract
(determinism, tiering, statistics formulas) is asserted in
tests/test_clustering.py, and the SQL-expressible derivations
(confidence F14, sizes A9, labels F15, assignment) are oracle-checked in
queries_metrics/queries_vector."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark import clustering
from sortify_spark.queries import register, _t


def _vectors_with_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with a synthetic tenant key (4 owners) — the per-owner
    sharding the reference applies to every clustering run."""
    return _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 4).cast("string").alias("owner_id"),
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
    )


@register(
    "cluster_per_owner",
    None,
    note="M1/M2: grouped-map per-owner spherical k-means (seeded, "
    "deterministic) + 3-tier triage with member lists and F14 confidence. "
    "Contract tests in tests/test_clustering.py.",
)
def q_cluster_per_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigns = clustering.cluster_per_owner(_vectors_with_owner(spark, sf_dir))
    organized = clustering.organize_clusters(assigns)
    return organized.select(
        "owner_id",
        "cluster_label",
        "document_count",
        "tier",
        "confidence",
        F.size("member_ids").alias("member_count"),
    )


@register(
    "clustering_statistics",
    None,
    note="M5+A7: write-back of assignments onto documents then "
    "pending/clustered/excluded counts + coverage percentage "
    "(apis/v1/clustering.py:606-636).",
)
def q_clustering_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    assigns = clustering.cluster_per_owner(_vectors_with_owner(spark, sf_dir))
    organized = clustering.organize_clusters(assigns)
    with_status = clustering.write_back_assignments(docs, organized)
    return clustering.clustering_statistics(with_status)


@register(
    "hierarchical_clusters",
    None,
    note="M4: two-level clustering — coarse pass (min size 8) then fine "
    "pass per parent; parent id folded into the grouped-map key.",
)
def q_hierarchical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    fine = clustering.hierarchical_cluster(_vectors_with_owner(spark, sf_dir))
    return (
        fine.groupBy("owner_id", "parent_label", "child_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("owner_id", "parent_label", "child_label")
    )
