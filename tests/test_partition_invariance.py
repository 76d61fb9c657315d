"""Partition-count invariance: the determinism contracts must hold at
ANY parallelism.

Every oracle-checked query claims engine-identical results; on a real
cluster the shuffle partition count is whatever the cluster is sized
to, not the 8 the test session uses.  A query whose result depends on
partitioning (order-dependent double sums, ties broken by arrival
order, per-partition state leaking into output) would pass the oracle
gate at one parallelism and silently diverge at another — the classic
"worked on local[8], wrong on 1000 executors" failure.  This test runs
a representative slice of the registry at two co-prime shuffle widths
and asserts bit-identical results.

The slice covers each determinism mechanism once: decimal aggregation
(pricing_summary), window + ntile tie-breaks (corpus_freq_buckets,
sequence_packing), sessionization windows (user_sessions), banded
near-dup joins (minhash_lsh_pairs), iterative distributed fixpoint
(neardup_components), self-join cosine thresholds (semdedup_prune),
rank fusion (rrf_fusion), and corpus-wide span counting
(common_span_removal).
"""

from __future__ import annotations

import pytest

from sortify_spark.all_queries import REGISTRY
from tests.conftest import SF_DIR

CASES = [
    "pricing_summary",
    "user_sessions",
    "rrf_fusion",
    "minhash_lsh_pairs",
    "neardup_components",
    "common_span_removal",
    "corpus_freq_buckets",
    "sequence_packing",
    "semdedup_prune",
    # round 7: prefix-filtered exact similarity join (candidate set and
    # verify must not depend on how prefixes are partitioned), keep-first
    # paragraph dedup (winner = MIN over a composite key — any
    # aggregation order), integer fixed-point PageRank (the determinism
    # contract SCALE.md claims), and strict-order funnel windows.
    "jaccard_prefix_join",
    "paragraph_dedup_keep_first",
    "pagerank_suppliers",
    "funnel_conversion",
]


def _rows(spark, name: str, parts: int):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        df = REGISTRY[name].fn(spark, SF_DIR)
        cols = sorted(df.columns)
        return sorted(
            df.select(*cols).collect(), key=lambda r: tuple(map(str, r))
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_width(spark, name):
    a = _rows(spark, name, 3)
    b = _rows(spark, name, 29)
    assert a == b, f"{name}: result depends on shuffle partition count"
