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


def dbscan_cluster_group(
    ids: list[str],
    vectors: np.ndarray,
    eps: float = 0.15,
    min_samples: int = MIN_CLUSTER_SIZE,
    min_docs: int = MIN_DOCS,
) -> tuple[list[int], list[float]]:
    """Exact DBSCAN on cosine distance (VERDICT r9 #7) — the injectable
    DENSITY kernel that closes the semantic distance to HDBSCAN on
    non-spherical clusters (a chain of pairwise-close points is ONE
    density-connected cluster here, where spherical k-means splits it).

    Semantics (Ester et al., KDD 1996, exact — no sampling, no index
    approximation): distance = 1 − cosine on L2-normalized vectors;
    core point ⇔ |N_eps(p)| ≥ min_samples (self included); clusters are
    the connected components of core points under the eps graph; border
    points attach to the first core neighbor's cluster in row order;
    everything else is noise (−1).  Deterministic given the caller's
    sorted-id row order — cluster ids number by the first core point
    encountered, so any engine replays the labeling exactly.

    ``probability`` mirrors the k-means kernel's contract: similarity
    to the assigned cluster's mean vector clipped to [0, 1]; noise
    scores 0.0 (the reference logs HDBSCAN probabilities the same way).

    Scale shape: runs INSIDE one grouped-map task over one owner's
    ≤10k vectors (the reference's own per-user cap,
    ``clustering_service.py:326``) — two passes of block × n BLAS
    products (float64 blocks of 1024 rows): pass 1 derives the core
    mask from neighbor COUNTS alone, pass 2 re-derives each expansion
    batch's eps-row on demand, so NO per-row neighbor lists are ever
    stored (a near-duplicate-saturated owner would make those lists
    n² int64 — hundreds of MB inside one Arrow task at the cap).
    Peak memory is O(block × n) booleans + O(n) labels; flops stay the
    same order as the one-shot similarity pass, and every point enters
    a frontier at most once.

    Label equivalence to textbook list-based DBSCAN: all points
    reached while growing cluster ``c`` get the SAME id, clusters grow
    one at a time in first-unassigned-core row order, and a border
    point reachable from two clusters always attaches to the
    earlier-grown one — so batching the frontier cannot change any
    label."""
    n = len(ids)
    if n < min_docs:
        return [NOISE] * n, [0.0] * n
    x = _l2_normalize_rows(vectors.astype(np.float64))
    sim_min = 1.0 - eps
    block_rows = 1024
    # pass 1: core mask from blockwise neighbor counts (self included)
    core = np.empty(n, dtype=bool)
    for start in range(0, n, block_rows):
        sims = x[start : start + block_rows] @ x.T  # (b, n)
        core[start : start + block_rows] = (
            (sims >= sim_min).sum(axis=1) >= min_samples
        )
    labels = np.full(n, NOISE, dtype=int)
    cluster = 0
    for p in range(n):
        if not core[p] or labels[p] != NOISE:
            continue
        # grow the cluster from this unassigned core; region queries
        # re-derive eps-rows for up to block_rows frontier cores at once
        labels[p] = cluster
        frontier = [p]
        while frontier:
            batch = np.asarray(frontier[:block_rows])
            del frontier[:block_rows]
            reach = np.flatnonzero(
                ((x[batch] @ x.T) >= sim_min).any(axis=0)
            )
            newly = reach[labels[reach] == NOISE]
            labels[newly] = cluster  # border or core
            frontier.extend(int(r) for r in newly if core[r])
        cluster += 1
    probs = np.zeros(n)
    for c in range(cluster):
        mask = labels == c
        m = x[mask].mean(axis=0)
        norm = np.linalg.norm(m)
        if norm > 0:
            m = m / norm
        probs[mask] = np.clip(x[mask] @ m, 0.0, 1.0)
    return labels.tolist(), [round(float(p), 6) for p in probs]


def cluster_per_owner(
    vectors: DataFrame,
    owner_col: str = "owner_id",
    id_col: str = "id",
    vec_col: str = "embedding",
    min_cluster_size: int = MIN_CLUSTER_SIZE,
    seed: int = 42,
    kernel: str = "kmeans",
    eps: float = 0.15,
) -> DataFrame:
    """M1: grouped-map clustering — one shuffle on the owner key, then
    each owner clusters independently in a single Arrow batch.

    ``kernel`` injects the clustering algorithm run inside each task
    (same output contract either way — labels with −1 noise +
    probabilities, feeding the M2/M5/A7 machinery unchanged):
    ``"kmeans"`` (default) is the seeded spherical k-means contract
    twin; ``"dbscan"`` is the exact density kernel
    (:func:`dbscan_cluster_group`, VERDICT r9 #7) whose behavior on
    non-spherical clusters matches HDBSCAN's density semantics; a
    CALLABLE ``(ids, vectors) -> (labels, probs)`` injects a custom
    kernel (e.g. real HDBSCAN where the library exists)."""
    if kernel == "kmeans":
        def kernel_fn(ids, vecs):
            return kmeans_cluster_group(
                ids, vecs, min_cluster_size, seed=seed
            )
    elif kernel == "dbscan":
        def kernel_fn(ids, vecs):
            return dbscan_cluster_group(
                ids, vecs, eps=eps, min_samples=min_cluster_size
            )
    elif callable(kernel):
        kernel_fn = kernel
    else:
        raise ValueError(
            f"kernel must be 'kmeans', 'dbscan', or a callable, "
            f"got {kernel!r}"
        )

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        vecs = np.stack(pdf["vec"].map(np.asarray))
        labels, probs = kernel_fn(pdf["id"].tolist(), vecs)
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


def modk_centroid_cluster(
    vectors: DataFrame,
    owner_col: str = "owner_id",
    id_col: str = "id",
    vec_col: str = "embedding",
    k: int = 3,
    noise_mod: int = 13,
) -> DataFrame:
    """Deterministic, fully SQL-expressible per-owner clustering kernel
    with the same output contract as :func:`cluster_per_owner`.

    Centroid ``c`` of owner ``o`` = element-wise mean of the owner's
    vectors whose ``id % k == c`` (a deterministic seeding); every vector
    is then assigned to its owner's nearest centroid (cosine rounded to
    6, lowest-bucket tie-break), and ids with ``id % noise_mod == 0`` are
    planted as noise (−1) so the downstream tier rules see all branches.

    Purpose: a driver-grade oracle can replay this kernel exactly in SQL,
    which makes the DETERMINISTIC clustering machinery (M2 tier triage,
    M5 write-back, A7 statistics, M4 parent/child bookkeeping)
    hash-checkable end-to-end — the seeded k-means kernel itself stays
    contract-tested (its argmax/assignment core IS this same shape).

    Scale: the centroid build is two map-side-combined shuffles at index
    build; assignment joins the tiny (owners × k) centroid table
    broadcast, and the per-vector argmax is one map-side-combined
    groupBy — no window sort, no driver collect.

    Ids must be castable to bigint (the DuckDB twin's CAST hard-errors on
    non-numeric ids); a non-castable id raises at execution time instead
    of silently landing in a NULL bucket.
    """
    prepared = vectors.select(
        F.col(owner_col).cast("string").alias("owner"),
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    # try_cast (not cast): under ANSI a plain cast throws a generic
    # NumberFormatException mid-codegen; try_cast + raise_error names the
    # function and the offending id.
    bkt_raw = F.expr("try_cast(id AS bigint)")
    keyed = prepared.withColumn(
        "bkt",
        F.when(
            bkt_raw.isNull() & F.col("id").isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit("modk_centroid_cluster: non-numeric id "),
                    F.col("id"),
                )
            ).cast("bigint"),
        ).otherwise(bkt_raw % k),
    )
    expl = keyed.select("owner", "bkt", F.posexplode("e").alias("i", "x"))
    dims = expl.groupBy("owner", "bkt", "i").agg(F.avg("x").alias("m"))
    cents = (
        dims.groupBy("owner", "bkt")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("p"))
        .select(
            "owner",
            "bkt",
            F.transform("p", lambda s: s.getField("m")).alias("cent"),
        )
    )
    from sortify_spark.functions.vectors import cosine

    scored = prepared.join(F.broadcast(cents), "owner").select(
        "owner",
        "id",
        "bkt",
        F.round(cosine(F.col("e"), F.col("cent")), 6).alias("sim"),
    )
    # Argmax via struct-max (map-side combine; cheaper than a window
    # sort): max (sim, -bkt) = highest sim, then lowest bucket.
    best = (
        scored.groupBy("owner", "id")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("bkt")).alias("nb"))).alias("b"))
        .select(
            "owner",
            "id",
            (-F.col("b.nb")).cast("int").alias("bkt"),
            F.col("b.sim").alias("sim"),
        )
    )
    noise = F.col("id").cast("bigint") % noise_mod == 0
    return best.select(
        F.col("owner").alias("owner_id"),
        "id",
        F.when(noise, F.lit(NOISE)).otherwise(F.col("bkt")).alias(
            "cluster_label"
        ),
        F.when(noise, F.lit(0.0))
        .otherwise(F.least(F.greatest(F.col("sim"), F.lit(0.0)), F.lit(1.0)))
        .alias("probability"),
    )


def hierarchical_cluster(
    vectors: DataFrame,
    owner_col: str = "owner_id",
    id_col: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    coarse_fn=None,
    fine_fn=None,
) -> DataFrame:
    """M4: two-level clustering — coarse pass (min size 8), then an
    independent fine pass within each parent cluster
    (``clustering_service.py:1127-1307``).  The parent id folds into the
    grouping key, so the second pass is the same grouped-map plan over
    (owner, parent) groups — no new machinery.

    ``coarse_fn`` / ``fine_fn`` inject the clustering kernel
    (``fn(vectors, owner_col, id_col, vec_col) -> ASSIGN_SCHEMA rows``);
    default is the seeded k-means grouped map.  The oracle-checked
    ``hierarchical_audit`` query injects :func:`modk_centroid_cluster`
    so the two-level bookkeeping is hash-verified against SQL."""
    if coarse_fn is None:
        def coarse_fn(v, oc, ic, vc):
            return cluster_per_owner(
                v, oc, ic, vc,
                min_cluster_size=COARSE_MIN_CLUSTER_SIZE, seed=seed,
            )

    if fine_fn is None:
        def fine_fn(v, oc, ic, vc):
            return cluster_per_owner(v, oc, ic, vc, seed=seed)

    coarse = coarse_fn(vectors, owner_col, id_col, vec_col).select(
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
    fine = fine_fn(
        enriched.filter(F.col("parent_label") != NOISE),
        "owner_parent",
        "doc_id2",
        "emb2",
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
