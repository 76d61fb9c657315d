"""Clustering contract tests (SURVEY.md §7.2-6): determinism, noise tier,
tier rules, statistics formulas — HDBSCAN parity is defined as contract
parity, not bit parity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sortify_spark import clustering
from sortify_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def vectors(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        (F.col("vec_id") % 4).cast("string").alias("owner_id"),
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
    )


def test_deterministic_across_runs(spark, vectors):
    a = clustering.cluster_per_owner(vectors).orderBy("owner_id", "id").collect()
    b = clustering.cluster_per_owner(vectors).orderBy("owner_id", "id").collect()
    assert a == b


def test_labels_include_noise_and_probabilities(spark, vectors):
    rows = clustering.cluster_per_owner(vectors).collect()
    labels = {r["cluster_label"] for r in rows}
    assert len(labels - {-1}) >= 2, "expected at least 2 real clusters"
    for r in rows:
        assert 0.0 <= r["probability"] <= 1.0
        if r["cluster_label"] == -1:
            assert r["probability"] == 0.0


def test_small_owner_all_noise(spark):
    rows = [(f"u", str(i), [float(i), 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, ["owner_id", "id", "embedding"])
    out = clustering.cluster_per_owner(df).collect()
    assert all(r["cluster_label"] == -1 for r in out), "min_docs=5 guard"


def test_tier_rules(spark):
    # synthetic assignments: cluster 0 size 4 (main), 1 size 2 (small),
    # 2 size 1 (excluded), -1 noise (excluded)
    rows = (
        [("u", str(i), 0, 0.9) for i in range(4)]
        + [("u", f"s{i}", 1, 0.8) for i in range(2)]
        + [("u", "x", 2, 0.7), ("u", "n", -1, 0.0)]
    )
    df = spark.createDataFrame(
        rows, ["owner_id", "id", "cluster_label", "probability"]
    )
    tiers = {
        r["cluster_label"]: r["tier"]
        for r in clustering.organize_clusters(df).collect()
    }
    assert tiers == {0: "main", 1: "small", 2: "excluded", -1: "excluded"}


def test_confidence_formula(spark):
    rows = [("u", str(i), 0, 0.9) for i in range(60)]
    df = spark.createDataFrame(
        rows, ["owner_id", "id", "cluster_label", "probability"]
    )
    out = clustering.organize_clusters(df).first()
    assert out["confidence"] == 0.95  # min(0.5 + 60/100, 0.95)


def test_write_back_and_statistics(spark, vectors):
    docs = load_table(spark, SF_DIR, "documents")
    organized = clustering.organize_clusters(
        clustering.cluster_per_owner(vectors)
    )
    wb = clustering.write_back_assignments(docs, organized)
    stats = clustering.clustering_statistics(wb).first()
    assert (
        stats["clustered_docs"] + stats["excluded_docs"] + stats["pending_docs"]
        == stats["total_docs"]
    )
    expect_cov = round(stats["clustered_docs"] / stats["total_docs"] * 100, 2)
    assert stats["coverage_pct"] == expect_cov


def test_hierarchical_runs(spark, vectors):
    fine = clustering.hierarchical_cluster(vectors)
    rows = fine.collect()
    assert rows
    assert {r["parent_label"] for r in rows} - {-1}, "parents exist"


def test_modk_rejects_non_numeric_ids(spark):
    """Library misuse fails loudly: a non-bigint-castable id must raise
    at execution time instead of silently landing in a NULL bucket (the
    DuckDB twin's CAST hard-errors on the same input)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    bad = spark.createDataFrame(
        [("u1", "doc-abc", [1.0, 0.0]), ("u1", "7", [0.0, 1.0]),
         ("u1", "8", [0.5, 0.5])],
        "owner_id string, id string, embedding array<double>",
    )
    out = clustering.modk_centroid_cluster(bad, k=2)
    with pytest.raises((Py4JJavaError, Exception), match="non-numeric id"):
        out.collect()


@pytest.mark.slow
def test_modk_numeric_ids_still_pass(spark):
    ok = spark.createDataFrame(
        [("u1", str(i), [float(i % 3), 1.0]) for i in range(12)],
        "owner_id string, id string, embedding array<double>",
    )
    rows = clustering.modk_centroid_cluster(ok, k=3).collect()
    assert len(rows) == 12


# --- round 10 (VERDICT r9 #7): injectable exact-DBSCAN density kernel ---


@pytest.mark.slow
def test_dbscan_kernel_contract(spark, vectors):
    """The dbscan kernel satisfies the same M1 contract as the k-means
    twin: deterministic, −1 noise present, probabilities in [0,1] with
    0.0 on noise, and the M2 triage consumes it unchanged."""
    out = clustering.cluster_per_owner(vectors, kernel="dbscan", eps=0.3)
    a = out.orderBy("owner_id", "id").collect()
    b = (
        clustering.cluster_per_owner(vectors, kernel="dbscan", eps=0.3)
        .orderBy("owner_id", "id")
        .collect()
    )
    assert a == b
    for r in a:
        assert 0.0 <= r["probability"] <= 1.0
        if r["cluster_label"] == -1:
            assert r["probability"] == 0.0
    # the embeddings fixture is near-random in cosine space (no dense
    # regions), so density clustering correctly calls most of it noise;
    # the triage must still consume the output cleanly ("main" tiers
    # are exercised on the crafted arcs below)
    tiers = {
        r["tier"]
        for r in clustering.organize_clusters(out).collect()
    }
    assert tiers <= {"main", "small", "excluded"} and tiers


def test_dbscan_recovers_nonspherical_chain(spark):
    """The density semantics k-means cannot express: a CHAIN of
    pairwise-close unit vectors (an arc) is one density-connected
    DBSCAN cluster; two well-separated arcs → exactly two clusters,
    far-off singletons → noise."""
    import math

    rows = []
    # arc A: 12 points spanning 110° in 10° steps — neighbors are ~10°
    # apart (cos 10° ≈ 0.985) but the arc ENDS are 110° apart
    # (cos ≈ −0.34): only density-chaining groups them
    for i in range(12):
        th = math.radians(i * 10)
        rows.append(("u", f"a{i:02d}", [math.cos(th), math.sin(th), 0.0]))
    # arc B: same shape, rotated far away (180°+)
    for i in range(12):
        th = math.radians(185 + i * 10)
        rows.append(("u", f"b{i:02d}", [math.cos(th), math.sin(th), 0.0]))
    # two isolated points (no eps-neighbors) → noise
    rows.append(("u", "z1", [0.0, 0.0, 1.0]))
    rows.append(("u", "z2", [0.0, 0.0, -1.0]))
    df = spark.createDataFrame(rows, ["owner_id", "id", "embedding"])
    # eps = 1 − cos(15°) ≈ 0.034: adjacent arc points connect, arcs
    # and outliers don't
    out = {
        r["id"]: r["cluster_label"]
        for r in clustering.cluster_per_owner(
            df, kernel="dbscan", eps=0.034
        ).collect()
    }
    a_labels = {out[f"a{i:02d}"] for i in range(12)}
    b_labels = {out[f"b{i:02d}"] for i in range(12)}
    assert len(a_labels) == 1 and len(b_labels) == 1, "each arc = 1 cluster"
    assert a_labels != b_labels
    assert out["z1"] == -1 and out["z2"] == -1
    # both arcs triage as MAIN clusters (size 12 ≥ min_cluster_size)
    assigned = clustering.cluster_per_owner(
        df, kernel="dbscan", eps=0.034
    )
    tiers = {
        r["cluster_label"]: r["tier"]
        for r in clustering.organize_clusters(assigned).collect()
    }
    assert tiers[a_labels.pop()] == "main"
    assert tiers[b_labels.pop()] == "main"
    assert tiers[-1] == "excluded"


def test_cluster_kernel_injection_validates(spark, vectors):
    """A custom callable kernel injects cleanly; a bogus kernel name
    fails loudly."""
    import pytest as _pytest

    def constant_kernel(ids, vecs):
        return [0] * len(ids), [1.0] * len(ids)

    out = clustering.cluster_per_owner(
        vectors, kernel=constant_kernel
    ).collect()
    assert {r["cluster_label"] for r in out} == {0}
    with _pytest.raises(ValueError, match="kernel"):
        clustering.cluster_per_owner(vectors, kernel="hdbscan")


def test_dbscan_blockwise_matches_listbased_reference():
    """Property check for the memory-bounded DBSCAN: the two-pass
    blockwise kernel (core counts + on-demand batched region queries)
    must label EXACTLY like textbook list-based DBSCAN — including
    cluster numbering and border-point attachment — on randomized
    inputs spanning chains, blobs, duplicates, and noise."""
    import numpy as np

    from sortify_spark.clustering import (
        NOISE,
        _l2_normalize_rows,
        dbscan_cluster_group,
    )

    def reference_dbscan(vectors, eps, min_samples, min_docs):
        n = len(vectors)
        if n < min_docs:
            return [NOISE] * n
        x = _l2_normalize_rows(vectors.astype(np.float64))
        sim_min = 1.0 - eps
        sims = x @ x.T
        neighbors = [np.flatnonzero(sims[r] >= sim_min) for r in range(n)]
        core = np.array(
            [len(nb) >= min_samples for nb in neighbors], dtype=bool
        )
        labels = np.full(n, NOISE, dtype=int)
        cluster = 0
        for p in range(n):
            if not core[p] or labels[p] != NOISE:
                continue
            labels[p] = cluster
            frontier = [p]
            while frontier:
                q = frontier.pop()
                for r in neighbors[q]:
                    if labels[r] == NOISE:
                        labels[r] = cluster
                        if core[r]:
                            frontier.append(int(r))
            cluster += 1
        return labels.tolist()

    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(3, 120))
        dim = int(rng.integers(2, 8))
        # mixture: a few tight blobs + uniform noise + exact duplicates
        centers = rng.normal(size=(int(rng.integers(1, 5)), dim))
        rows = []
        for _ in range(n):
            kind = rng.random()
            if kind < 0.6:
                c = centers[int(rng.integers(0, len(centers)))]
                rows.append(c + rng.normal(scale=0.05, size=dim))
            elif kind < 0.75 and rows:
                rows.append(rows[int(rng.integers(0, len(rows)))])
            else:
                rows.append(rng.normal(size=dim))
        vecs = np.array(rows)
        eps = float(rng.uniform(0.01, 0.5))
        min_samples = int(rng.integers(1, 6))
        ids = [str(i) for i in range(n)]
        got, _probs = dbscan_cluster_group(
            ids, vecs.copy(), eps=eps, min_samples=min_samples, min_docs=3
        )
        want = reference_dbscan(vecs.copy(), eps, min_samples, min_docs=3)
        assert got == want, (
            f"trial {trial}: n={n} eps={eps} min_samples={min_samples}"
        )

    # one near-duplicate-saturated owner past the 1024-row block size —
    # the exact shape whose neighbor lists would have been n² — so the
    # frontier batching and pass-1 block seams are both crossed
    n = 2500
    blob = rng.normal(size=4) + rng.normal(scale=0.01, size=(n - 50, 4))
    noise = rng.normal(size=(50, 4))
    vecs = np.vstack([blob, noise])
    perm = rng.permutation(n)
    vecs = vecs[perm]
    ids = [str(i) for i in range(n)]
    got, _probs = dbscan_cluster_group(
        ids, vecs.copy(), eps=0.05, min_samples=4, min_docs=3
    )
    want = reference_dbscan(vecs.copy(), 0.05, 4, min_docs=3)
    assert got == want
    assert max(got) >= 0  # the saturated blob did form a cluster
