"""Per-owner document clustering (SURVEY.md §2.9, M1-M5).

The reference runs HDBSCAN per user over ≤10 000 L2-normalized embedding
vectors (``clustering_service.py:387-455``).  Spark has no HDBSCAN; per
SURVEY.md §7.2-6 the engine reproduces the *contract*, not the library:

* deterministic given a seed;
* labels include −1 noise;
* 3-tier triage: main (size ≥ min_cluster_size), small (== 2 → "other"),
  excluded (noise / singletons) — ``clustering_service.py:149-183,457-480``;
* confidence = min(0.5 + n/100, 0.95) (F14);
* statistics/coverage formulas identical (A7/A9).

Architecture is the idiomatic Spark answer for "small-per-group, many
groups": ``applyInPandas`` grouped-map — each owner's corpus fits one
task (the reference itself caps at 10 000 vectors/user), and owners
parallelize across the cluster.  The clustering kernel inside the task is
a seeded numpy k-means on unit vectors (spherical); at 100 TB the same
plan shape holds because the per-group bound is what matters, not total
corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIN_CLUSTER_SIZE = 3  # reference HDBSCAN min_cluster_size
MIN_DOCS = 5  # reference: skip owners with < 5 docs
COARSE_MIN_CLUSTER_SIZE = 8  # hierarchical pass 1
NOISE = -1

ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("owner_id", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("cluster_label", T.IntegerType()),
        T.StructField("probability", T.DoubleType()),
    ]
)


def _l2_normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def kmeans_cluster_group(
    ids: list[str],
    vectors: np.ndarray,
    min_cluster_size: int = MIN_CLUSTER_SIZE,
    min_docs: int = MIN_DOCS,
    seed: int = 42,
    max_iter: int = 20,
) -> tuple[list[int], list[float]]:
    """Deterministic spherical k-means with noise marking — the clustering
    kernel run inside each grouped-map task.

    k is chosen as ⌈n / (4·min_cluster_size)⌉ clamped to [2, 16]; points
    whose similarity to their centroid falls below (mean − 2σ) of their
    cluster's similarities are marked noise (−1), mirroring HDBSCAN's
    notion of unassigned points.  ``probability`` is the similarity to the
    assigned centroid clipped to [0, 1] (the reference logs HDBSCAN
    probabilities).
    """
    n = len(ids)
    if n < min_docs:
        return [NOISE] * n, [0.0] * n
    x = _l2_normalize_rows(vectors.astype(np.float64))
    k = int(np.clip(int(np.ceil(n / (4 * min_cluster_size))), 2, 16))
    rng = np.random.default_rng(seed)
    # k-means++-style seeded init on the deterministic row order
    centroids = x[rng.choice(n, size=k, replace=False)]
    labels = np.zeros(n, dtype=int)
    for _ in range(max_iter):
        sims = x @ centroids.T  # cosine == dot on unit vectors
        new_labels = np.argmax(sims, axis=1)
        if np.array_equal(new_labels, labels) and _ > 0:
            break
        labels = new_labels
        for c in range(k):
            members = x[labels == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                centroids[c] = m / norm if norm > 0 else m
    best_sim = (x * centroids[labels]).sum(axis=1)
    out = labels.copy()
    for c in range(k):
        mask = labels == c
        if mask.sum() == 0:
            continue
        mu, sigma = best_sim[mask].mean(), best_sim[mask].std()
        noise_mask = mask & (best_sim < mu - 2 * sigma)
        out[noise_mask] = NOISE
    probs = np.clip(best_sim, 0.0, 1.0)
    probs[out == NOISE] = 0.0
    return out.tolist(), [round(float(p), 6) for p in probs]


def cluster_per_owner(
    vectors: DataFrame,
    owner_col: str = "owner_id",
    id_col: str = "id",
    vec_col: str = "embedding",
    min_cluster_size: int = MIN_CLUSTER_SIZE,
    seed: int = 42,
) -> DataFrame:
    """M1: grouped-map clustering — one shuffle on the owner key, then
    each owner clusters independently in a single Arrow batch."""

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        vecs = np.stack(pdf["vec"].map(np.asarray))
        labels, probs = kmeans_cluster_group(
            pdf["id"].tolist(), vecs, min_cluster_size, seed=seed
        )
        return pd.DataFrame(
            {
                "owner_id": pdf["owner"],
                "id": pdf["id"],
                "cluster_label": labels,
                "probability": probs,
            }
        )

    prepared = vectors.select(
        F.col(owner_col).cast("string").alias("owner"),
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).alias("vec"),
    )
    return prepared.groupBy("owner").applyInPandas(_cluster, ASSIGN_SCHEMA)


def organize_clusters(
    assignments: DataFrame, min_cluster_size: int = MIN_CLUSTER_SIZE
) -> DataFrame:
    """M2: 3-tier triage — main (≥ min), small (== 2 → 'other'), excluded
    (noise + singletons); cluster rows carry member lists + F14
    confidence (``clustering_service.py:149-183,457-480,908-909``)."""
    grouped = (
        assignments.groupBy("owner_id", "cluster_label")
        .agg(
            F.count(F.lit(1)).alias("document_count"),
            F.array_sort(F.collect_list("id")).alias("member_ids"),
        )
    )
    tier = (
        F.when(F.col("cluster_label") == NOISE, F.lit("excluded"))
        .when(F.col("document_count") >= min_cluster_size, F.lit("main"))
        .when(F.col("document_count") == 2, F.lit("small"))
        .otherwise(F.lit("excluded"))
    )
    return grouped.select(
        "owner_id",
        "cluster_label",
        "document_count",
        "member_ids",
        tier.alias("tier"),
        F.round(
            F.least(
                F.lit(0.95), 0.5 + F.col("document_count").cast("double") / 100
            ),
            4,
        ).alias("confidence"),
    )


def write_back_assignments(
    documents: DataFrame,
    clusters: DataFrame,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """M5: join assignments back onto the documents table, setting
    cluster columns and clustering_status ∈ {clustered, excluded}
    (``clustering_service.py:888-958`` ``update_many`` → here a single
    broadcast-join overwrite; with Delta this is a MERGE)."""
    flat = clusters.select(
        "owner_id",
        "cluster_label",
        "tier",
        "confidence",
        F.explode("member_ids").alias("__id"),
    )
    joined = documents.join(
        F.broadcast(flat),
        documents[doc_id_col].cast("string") == flat["__id"],
        "left",
    )
    status = (
        F.when(F.col("tier").isNull(), F.lit("pending"))
        .when(F.col("tier") == "excluded", F.lit("excluded"))
        .otherwise(F.lit("clustered"))
    )
    return joined.drop("__id").withColumn("clustering_status", status)


def clustering_statistics(with_status: DataFrame) -> DataFrame:
    """A7: pending/clustered/excluded counts + coverage percentage
    (``apis/v1/clustering.py:606-636``)."""
    n = F.count(F.lit(1))
    clustered = F.count(F.when(F.col("clustering_status") == "clustered", 1))
    return with_status.agg(
        n.alias("total_docs"),
        clustered.alias("clustered_docs"),
        F.count(F.when(F.col("clustering_status") == "excluded", 1)).alias(
            "excluded_docs"
        ),
        F.count(F.when(F.col("clustering_status") == "pending", 1)).alias(
            "pending_docs"
        ),
        F.round(clustered.cast("double") / n * 100, 2).alias("coverage_pct"),
    )


def hierarchical_cluster(
    vectors: DataFrame,
    owner_col: str = "owner_id",
    id_col: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """M4: two-level clustering — coarse pass (min size 8), then an
    independent fine pass within each parent cluster
    (``clustering_service.py:1127-1307``).  The parent id folds into the
    grouping key, so the second pass is the same grouped-map plan over
    (owner, parent) groups — no new machinery."""
    coarse = cluster_per_owner(
        vectors, owner_col, id_col, vec_col,
        min_cluster_size=COARSE_MIN_CLUSTER_SIZE, seed=seed,
    ).select(
        F.col("owner_id").alias("owner"),
        F.col("id"),
        F.col("cluster_label").alias("parent_label"),
    )
    enriched = vectors.join(
        coarse,
        (vectors[owner_col].cast("string") == coarse["owner"])
        & (vectors[id_col].cast("string") == coarse["id"]),
    ).select(
        F.concat_ws(
            "/", F.col("owner"), F.col("parent_label").cast("string")
        ).alias("owner_parent"),
        coarse["id"].alias("doc_id2"),
        F.col(vec_col).alias("emb2"),
        F.col("parent_label"),
    )
    fine = cluster_per_owner(
        enriched.filter(F.col("parent_label") != NOISE),
        owner_col="owner_parent",
        id_col="doc_id2",
        vec_col="emb2",
        seed=seed,
    )
    return fine.select(
        F.split(F.col("owner_id"), "/").getItem(0).alias("owner_id"),
        F.split(F.col("owner_id"), "/").getItem(1).cast("int").alias(
            "parent_label"
        ),
        "id",
        F.col("cluster_label").alias("child_label"),
        "probability",
    )
