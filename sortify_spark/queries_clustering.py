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


# ---------------------------------------------------------------------------
# Oracle-checked clustering contracts (VERDICT r2 item 6): the deterministic
# half of M1/M2/M4/M5/A7 — tier rules, sizes, member bookkeeping, write-back
# statistics, parent/child arithmetic — hash-checked by replaying the
# SQL-expressible modk kernel (clustering.modk_centroid_cluster) in DuckDB.
# ---------------------------------------------------------------------------


def _modk_sql(prefix: str, src: str, k: int = 3, noise_mod: int = 13) -> str:
    """DuckDB CTE chain replaying modk_centroid_cluster over ``src``
    (owner VARCHAR, id VARCHAR, e DOUBLE[]) — emits ``{prefix}_assign``
    with (owner, id, cluster_label, probability)."""
    return f"""
    {prefix}_expl AS (
      SELECT owner, CAST(id AS BIGINT) % {k} AS bkt,
             unnest(range(1, len(e) + 1)) AS i, unnest(e) AS x
      FROM {src}
    ),
    {prefix}_dims AS (
      SELECT owner, bkt, i, AVG(x) AS m
      FROM {prefix}_expl GROUP BY owner, bkt, i
    ),
    {prefix}_cents AS (
      SELECT owner, bkt, list(m ORDER BY i) AS cent
      FROM {prefix}_dims GROUP BY owner, bkt
    ),
    {prefix}_scored AS (
      SELECT s.owner, s.id, c.bkt,
             ROUND(list_cosine_similarity(s.e, c.cent), 6) AS sim
      FROM {src} s JOIN {prefix}_cents c ON s.owner = c.owner
    ),
    {prefix}_best AS (
      SELECT owner, id, bkt, sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY owner, id
                                     ORDER BY sim DESC, bkt ASC) AS rn
        FROM {prefix}_scored
      ) WHERE rn = 1
    ),
    {prefix}_assign AS (
      SELECT owner, id,
             CASE WHEN CAST(id AS BIGINT) % {noise_mod} = 0 THEN -1
                  ELSE CAST(bkt AS INT) END AS cluster_label,
             CASE WHEN CAST(id AS BIGINT) % {noise_mod} = 0 THEN 0.0
                  ELSE LEAST(GREATEST(sim, 0.0), 1.0) END AS probability
      FROM {prefix}_best
    )"""


_ORGANIZE_OWNER_MOD = 101  # fine split → main/small/excluded tiers all occur


@register(
    "cluster_organize_audit",
    f"""
    WITH src AS (
      SELECT CAST(vec_id % {_ORGANIZE_OWNER_MOD} AS VARCHAR) AS owner,
             CAST(vec_id AS VARCHAR) AS id,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    {_modk_sql('m', 'src')}
    SELECT owner AS owner_id, cluster_label,
           COUNT(*) AS document_count,
           CASE WHEN cluster_label = -1 THEN 'excluded'
                WHEN COUNT(*) >= 3 THEN 'main'
                WHEN COUNT(*) = 2 THEN 'small'
                ELSE 'excluded' END AS tier,
           ROUND(LEAST(0.95, 0.5 + COUNT(*) / 100.0), 4) AS confidence,
           MIN(id) AS member_min, MAX(id) AS member_max
    FROM m_assign GROUP BY owner, cluster_label
    """,
    note="M2 tier triage + F14 confidence, hash-checked: the "
    "organize_clusters machinery (groupBy + member lists + tier rules) "
    "runs over the deterministic modk kernel, and the oracle replays "
    "kernel AND triage in SQL. Fine owner split (mod 101) makes every "
    "tier branch (main/small/excluded-noise/excluded-singleton) occur.",
)
def q_cluster_organize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % _ORGANIZE_OWNER_MOD).cast("string").alias("owner_id"),
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
    )
    assigns = clustering.modk_centroid_cluster(emb)
    organized = clustering.organize_clusters(assigns)
    return organized.select(
        "owner_id",
        "cluster_label",
        "document_count",
        "tier",
        "confidence",
        F.element_at("member_ids", 1).alias("member_min"),
        F.element_at("member_ids", -1).alias("member_max"),
    )


#: Shared CTE chain: modk assignments over the non-held-out stratum
#: (vec_id % 11 <> 3 — the held-out rows stay 'pending'), tier triage,
#: and the per-row write-back status — reused by the A7 statistics
#: oracle AND the P10 pending-scan oracle below.
_STATUS_CTES = f"""
    WITH src AS (
      SELECT CAST(vec_id % 4 AS VARCHAR) AS owner,
             CAST(vec_id AS VARCHAR) AS id,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
      WHERE vec_id % 11 <> 3
    ),
    {_modk_sql('m', 'src')},
    tiers AS (
      SELECT owner, cluster_label, COUNT(*) AS n,
             CASE WHEN cluster_label = -1 THEN 'excluded'
                  WHEN COUNT(*) >= 3 THEN 'main'
                  WHEN COUNT(*) = 2 THEN 'small'
                  ELSE 'excluded' END AS tier
      FROM m_assign GROUP BY owner, cluster_label
    ),
    status AS (
      SELECT e.vec_id, e.label,
             CASE WHEN t.tier IS NULL THEN 'pending'
                  WHEN t.tier = 'excluded' THEN 'excluded'
                  ELSE 'clustered' END AS s
      FROM embeddings e
      LEFT JOIN m_assign a ON CAST(e.vec_id AS VARCHAR) = a.id
      LEFT JOIN tiers t ON a.owner = t.owner
                       AND a.cluster_label = t.cluster_label
    )"""


@register(
    "clustering_stats_audit",
    f"""
    {_STATUS_CTES}
    SELECT COUNT(*) AS total_docs,
           COUNT(CASE WHEN s = 'clustered' THEN 1 END) AS clustered_docs,
           COUNT(CASE WHEN s = 'excluded' THEN 1 END) AS excluded_docs,
           COUNT(CASE WHEN s = 'pending' THEN 1 END) AS pending_docs,
           ROUND(COUNT(CASE WHEN s = 'clustered' THEN 1 END)
                 / CAST(COUNT(*) AS DOUBLE) * 100, 2) AS coverage_pct
    FROM status
    """,
    note="M5 write-back + A7 statistics, hash-checked: assignments from "
    "the modk kernel (with a held-out stratum, vec_id % 11 = 3, left "
    "unclustered) are written back onto the corpus via the broadcast "
    "member-explode join, then pending/clustered/excluded counts and "
    "coverage replay in SQL — every status branch is exercised.",
)
def q_clustering_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    clustered_in = emb.filter(F.col("vec_id") % 11 != 3).select(
        (F.col("vec_id") % 4).cast("string").alias("owner_id"),
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
    )
    assigns = clustering.modk_centroid_cluster(clustered_in)
    organized = clustering.organize_clusters(assigns)
    with_status = clustering.write_back_assignments(
        emb, organized, doc_id_col="vec_id"
    )
    return clustering.clustering_statistics(with_status)


@register(
    "pending_ids_scan",
    f"""
    {_STATUS_CTES}
    SELECT vec_id AS id FROM status
    WHERE s = 'pending' AND label IS NOT NULL
    ORDER BY id
    """,
    note="P10 hash-checked (the last §2 rows-only row): the pending-for-"
    "clustering id-projection scan — clustering_status = 'pending' "
    "(rows the write-back never touched, the null-or-missing branch) "
    "AND a non-null payload predicate (the enriched_data IS NOT NULL "
    "analog), projecting only ids (clustering_service.py:341-357).  "
    "Status derives from the modk write-back so the filter's input is "
    "itself oracle-replayed.",
)
def q_pending_ids_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    clustered_in = emb.filter(F.col("vec_id") % 11 != 3).select(
        (F.col("vec_id") % 4).cast("string").alias("owner_id"),
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
    )
    assigns = clustering.modk_centroid_cluster(clustered_in)
    organized = clustering.organize_clusters(assigns)
    with_status = clustering.write_back_assignments(
        emb, organized, doc_id_col="vec_id"
    )
    return (
        with_status.filter(
            (F.col("clustering_status") == "pending")
            & F.col("label").isNotNull()
        )
        .select(F.col("vec_id").alias("id"))
        .orderBy("id")
    )


@register(
    "hierarchical_audit",
    f"""
    WITH src1 AS (
      SELECT CAST(vec_id % 4 AS VARCHAR) AS owner,
             CAST(vec_id AS VARCHAR) AS id,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    {_modk_sql('l1', 'src1')},
    src2 AS (
      SELECT a.owner || '/' || CAST(a.cluster_label AS VARCHAR) AS owner,
             s.id, s.e
      FROM l1_assign a
      JOIN src1 s ON a.owner = s.owner AND a.id = s.id
      WHERE a.cluster_label <> -1
    ),
    {_modk_sql('l2', 'src2')}
    SELECT string_split(owner, '/')[1] AS owner_id,
           CAST(string_split(owner, '/')[2] AS INT) AS parent_label,
           cluster_label AS child_label,
           COUNT(*) AS n_docs, MIN(id) AS min_id, MAX(id) AS max_id
    FROM l2_assign GROUP BY 1, 2, 3
    """,
    note="M4 two-level bookkeeping, hash-checked: hierarchical_cluster "
    "with the modk kernel injected at both levels — parent-id folding "
    "into the grouping key, noise exclusion between passes, and the "
    "owner/parent split-back are all replayed in SQL "
    "(clustering_service.py:1127-1307 contract).",
)
def q_hierarchical_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def kernel(v, oc, ic, vc):
        return clustering.modk_centroid_cluster(v, oc, ic, vc)

    fine = clustering.hierarchical_cluster(
        _vectors_with_owner(spark, sf_dir), coarse_fn=kernel, fine_fn=kernel
    )
    return fine.groupBy("owner_id", "parent_label", "child_label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


def _dbscan_oracle_sql(eps: float = 0.3, min_samples: int = 3, dim: int = 64) -> str:
    """Oracle for ``cluster_per_owner_dbscan``: a FULL pure-SQL replay
    of the exact blockwise DBSCAN kernel (``clustering.py:105``,
    VERDICT r10 #4) on a deterministically cluster-structured corpus.
    The stub embeddings are isotropic noise (max pairwise cosine
    ~0.44), so the query plants density: every 25th base vector gains
    4 copies perturbed by exact IEEE arithmetic on one coordinate
    (``e[0] + 0.02*rep`` — the same double ops in both engines), giving
    5-point cliques with intra-clique cosine ~0.999 against a 0.7
    threshold — a >0.25 margin on both sides, so the eps comparison
    can never flip between engines.  The replay: per-owner pairwise
    cosines → core mask (>= min_samples neighbors incl. self) →
    recursive min-label propagation over the core-core eps graph
    (connected components) → components numbered by their minimum
    row-order (sorted-id) core, matching the kernel's
    first-unassigned-core growth order → border points take the MIN
    neighboring cluster id (the earlier-grown cluster reaches them
    first) → rest is noise (-1).  Probability replays the kernel's
    normalized-cluster-mean similarity, rounded to 3 (label integers
    are the hash substance; round-3 keeps float summation-order ulps
    out of the gate)."""
    thr = 1.0 - eps
    return f"""
    WITH RECURSIVE
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
             FROM embeddings),
    orig AS (SELECT CAST(vec_id % 4 AS VARCHAR) AS owner,
                    lpad(CAST(vec_id AS VARCHAR), 8, '0') AS id, e
             FROM base),
    reps AS (SELECT unnest([1, 2, 3, 4]) AS rep),
    pc AS (SELECT CAST(b.vec_id % 4 AS VARCHAR) AS owner,
                  lpad(CAST(10000000 + b.vec_id * 10 + r.rep
                            AS VARCHAR), 8, '0') AS id,
                  i.range AS i,
                  CASE WHEN i.range = 1
                       THEN b.e[i.range] + 0.02 * r.rep
                       ELSE b.e[i.range] END AS xi
           FROM base b, reps r, range(1, {dim + 1}) i
           WHERE b.vec_id % 25 = 0),
    copies AS (SELECT owner, id, list(xi ORDER BY i) AS e
               FROM pc GROUP BY owner, id),
    v AS (SELECT * FROM orig UNION ALL SELECT * FROM copies),
    r2 AS (SELECT owner, id, e,
                  ROW_NUMBER() OVER (PARTITION BY owner ORDER BY id)
                    - 1 AS rn
           FROM v),
    s AS (SELECT a.owner, a.rn AS i, b.rn AS j,
                 list_cosine_similarity(a.e, b.e) AS sim
          FROM r2 a JOIN r2 b ON a.owner = b.owner),
    core AS (SELECT owner, i AS rn,
                    (COUNT(*) FILTER (WHERE sim >= {thr}))
                      >= {min_samples} AS is_core
             FROM s GROUP BY owner, i),
    ce AS (SELECT s.owner, s.i, s.j FROM s
           JOIN core ca ON ca.owner = s.owner AND ca.rn = s.i
                AND ca.is_core
           JOIN core cb ON cb.owner = s.owner AND cb.rn = s.j
                AND cb.is_core
           WHERE s.sim >= {thr}),
    comp(owner, rn, rep) AS (
        SELECT owner, rn, rn FROM core WHERE is_core
        UNION
        SELECT ce.owner, ce.i, c.rep
        FROM ce JOIN comp c ON c.owner = ce.owner AND c.rn = ce.j),
    crep AS (SELECT owner, rn, MIN(rep) AS rep
             FROM comp GROUP BY owner, rn),
    cnum AS (SELECT owner, rep,
                    ROW_NUMBER() OVER (PARTITION BY owner
                                       ORDER BY rep) - 1 AS cl
             FROM (SELECT DISTINCT owner, rep FROM crep) d),
    corelab AS (SELECT crep.owner, crep.rn, cnum.cl
                FROM crep JOIN cnum ON cnum.owner = crep.owner
                     AND cnum.rep = crep.rep),
    border AS (SELECT s.owner, s.i AS rn, MIN(cl2.cl) AS cl
               FROM s
               JOIN core cme ON cme.owner = s.owner
                    AND cme.rn = s.i AND NOT cme.is_core
               JOIN corelab cl2 ON cl2.owner = s.owner
                    AND cl2.rn = s.j
               WHERE s.sim >= {thr}
               GROUP BY s.owner, s.i),
    lab AS (SELECT r2.owner, r2.id, r2.rn, r2.e,
                   CAST(COALESCE(corelab.cl, border.cl, -1) AS INT)
                     AS cluster_label
            FROM r2
            LEFT JOIN corelab ON corelab.owner = r2.owner
                 AND corelab.rn = r2.rn
            LEFT JOIN border ON border.owner = r2.owner
                 AND border.rn = r2.rn),
    nrm AS (SELECT owner, id, cluster_label,
                   list_transform(
                     e,
                     x -> x / sqrt(list_sum(
                       list_transform(e, y -> y * y)))) AS en
            FROM lab),
    md AS (SELECT owner, cluster_label, i.range AS i,
                  AVG(en[i.range]) AS mi
           FROM nrm, range(1, {dim + 1}) i
           WHERE cluster_label >= 0
           GROUP BY owner, cluster_label, i.range),
    mv AS (SELECT owner, cluster_label, list(mi ORDER BY i) AS m
           FROM md GROUP BY owner, cluster_label)
    SELECT n.owner AS owner_id, n.id, n.cluster_label,
           CASE WHEN n.cluster_label < 0 THEN 0.0
                ELSE ROUND(GREATEST(0.0, LEAST(1.0,
                       list_cosine_similarity(mv.m, n.en))), 3)
           END AS probability
    FROM nrm n
    LEFT JOIN mv ON mv.owner = n.owner
         AND mv.cluster_label = n.cluster_label
    ORDER BY owner_id, id
    """


@register(
    "cluster_per_owner_dbscan",
    _dbscan_oracle_sql(),
    note="M1 DENSITY kernel, hash-checked (VERDICT r10 #4): per-owner "
    "exact blockwise DBSCAN on cosine (clustering.py:105 — the "
    "HDBSCAN-semantics kernel the reference runs via the hdbscan "
    "library, clustering_service.py:387-430) over a deterministically "
    "planted corpus: every 25th stub vector gains 4 exact-arithmetic "
    "perturbed copies (5-point cliques, intra-cosine ~0.999) amid "
    "isotropic noise (max ~0.44) against eps=0.3 — both sides of the "
    "threshold have >0.25 margin.  The oracle replays the whole "
    "kernel in SQL: core mask, recursive components over the "
    "core-core eps graph, first-core growth numbering, min-cluster "
    "border attachment, noise, and the normalized-mean probability.",
)
def q_cluster_per_owner_dbscan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    orig = emb.select(
        F.pmod(F.col("vec_id"), F.lit(4)).cast("string").alias("owner"),
        F.lpad(F.col("vec_id").cast("string"), 8, "0").alias("id"),
        "e",
    )
    reps = spark.range(1, 5).select(F.col("id").cast("int").alias("rep"))
    copies = (
        emb.filter(F.col("vec_id") % 25 == 0)
        .crossJoin(F.broadcast(reps))
        .select(
            F.pmod(F.col("vec_id"), F.lit(4))
            .cast("string")
            .alias("owner"),
            F.lpad(
                (
                    F.lit(10_000_000)
                    + F.col("vec_id") * 10
                    + F.col("rep")
                ).cast("string"),
                8,
                "0",
            ).alias("id"),
            F.transform(
                "e",
                lambda x, i: F.when(
                    i == 0, x + F.lit(0.02) * F.col("rep")
                ).otherwise(x),
            ).alias("e"),
        )
    )
    v = orig.unionByName(copies)
    assigns = clustering.cluster_per_owner(
        v,
        owner_col="owner",
        id_col="id",
        vec_col="e",
        kernel="dbscan",
        eps=0.3,
    )
    return assigns.select(
        "owner_id",
        "id",
        "cluster_label",
        F.round("probability", 3).alias("probability"),
    ).orderBy("owner_id", "id")
