"""Vector-operator tests without SQL twins: IVF recall, embedding stub
determinism, normalization."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from sortify_spark.functions.vectors import hash_embed_text, l2_normalize
from sortify_spark.search import knn
from sortify_spark.tables import load_table
from tests.conftest import SF_DIR


def test_hash_embed_deterministic_and_normalized():
    a = hash_embed_text("spark engine query", dim=64)
    b = hash_embed_text("spark engine query", dim=64)
    assert a == b
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-6
    assert hash_embed_text("", dim=8) == [0.0] * 8
    # token order matters only through the bag (sum) — permutation invariant
    c = hash_embed_text("query engine spark", dim=64)
    assert np.allclose(a, c)


def test_l2_normalize(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "v"])
    out = df.select(l2_normalize(F.col("v")).alias("n")).first()["n"]
    assert abs(out[0] - 0.6) < 1e-12 and abs(out[1] - 0.8) < 1e-12


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=3 of 10 label buckets must recover most of the
    exact top-10 (embeddings cluster by label, so centroid routing is
    informative on this data)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    rest = emb.filter(F.col("vec_id") != 0)

    exact = {
        r["vec_id"]
        for r in knn.brute_force_topk(rest, q, k=10).collect()
    }
    centroids = knn.build_centroids(emb, "label")
    approx = {
        r["vec_id"]
        for r in knn.ivf_topk(rest, centroids, q, k=10, nprobe=3).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_centroids_match_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings").toPandas()
    got = {
        r["bucket"]: np.array(r["centroid"])
        for r in knn.build_centroids(
            load_table(spark, SF_DIR, "embeddings"), "label"
        ).collect()
    }
    for label, grp in emb.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].map(np.asarray)), axis=0)
        assert np.allclose(got[label], want, atol=1e-9), label


def test_embedding_neardup_rejects_unblocked(spark):
    """block_col=None is an all-pairs n² cliff — rejected unless the
    caller opts in explicitly."""
    import pytest

    from sortify_spark.dedup import embedding_neardup_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_neardup_topk(emb, block_col=None)
    # explicit opt-in still works on a small bounded input
    out = embedding_neardup_topk(
        emb.limit(50), block_col=None, k=5, allow_unblocked=True
    ).collect()
    assert len(out) == 5
