"""Semantics tests for queries_linkage: blocking behavior of the fuzzy
record linker and exact-integer determinism of PageRank."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sortify_spark.queries_linkage import (
    PR_SCALE,
    fuzzy_link_parts,
    pagerank_suppliers,
)


def _parts(spark, rows):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(rows)], "p_partkey long, p_name string"
    )


def test_fuzzy_link_finds_within_block_pairs(spark):
    df = _parts(
        spark,
        ["red bolt", "red bolt", "red bolts", "rad bolt", "green gear"],
    )
    out = fuzzy_link_parts(df).collect()
    pairs = {(r.name_a, r.name_b): (r.dist, r.cnt_a, r.cnt_b) for r in out}
    # dist 1 within the shared-token block, counts joined back
    assert pairs[("red bolt", "red bolts")] == (1, 2, 1)
    assert pairs[("rad bolt", "red bolt")] == (1, 1, 2)
    # within distance but sharing NO token (bolt != bolts): not blocked,
    # so not linked — the documented recall trade of single-pass
    # token blocking (same trade LSH banding makes).
    assert ("rad bolt", "red bolts") not in pairs
    # unrelated names never generated as candidates
    assert ("green gear", "red bolt") not in pairs
    assert all(a < b for a, b in pairs)


@pytest.mark.slow
def test_fuzzy_link_guard_invariant(spark):
    """Forcing the hot-bucket guard on (every token block over-cap,
    sub-split) must leave the linked pair set identical — the r7
    verdict's adversarial-skew hardening for a common blocking token."""
    rows = [f"steel part {i}" for i in range(30)] + ["steel part 1x"]
    df = _parts(spark, rows)
    base = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_link_parts(df).collect()
    }
    for cap, groups in ((1, 3), (5, 2)):
        got = {
            (r.name_a, r.name_b, r.dist)
            for r in fuzzy_link_parts(
                df, hot_cap=cap, hot_groups=groups
            ).collect()
        }
        assert got == base, (cap, groups)
    assert base  # the adversarial block really links pairs
    # documented bypass for known-bounded block tables (VERDICT r8 #1):
    # same pair set through the raw unguarded equi-join
    bypass = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_link_parts(df, hot_cap=None).collect()
    }
    assert bypass == base


def test_fuzzy_link_requires_shared_token_block(spark):
    # "abc x" vs "abd y" are edit distance 2 but share no token: the
    # blocker must never generate the candidate (that is the point —
    # sum(block^2), not corpus^2).
    df = _parts(spark, ["abc x", "abd y"])
    assert fuzzy_link_parts(df).count() == 0


def _graph(spark):
    orders = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 12)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 100), (3, 100), (4, 101), (4, 102)],
        "l_orderkey long, l_suppkey long",
    )
    return orders, lineitem


@pytest.mark.slow
def test_pagerank_in_degree_dominates(spark):
    orders, lineitem = _graph(spark)
    out = pagerank_suppliers(orders, lineitem, top=10).collect()
    ranks = {r.s_suppkey: r.rank for r in out}
    # supplier 100 has 3 distinct customer edges, 101 has 2, 102 has 1
    assert ranks[100] < ranks[101] < ranks[102]
    # total supplier mass is bounded by the scale (dangling mass drops)
    assert sum(r.pr_units for r in out) <= PR_SCALE


@pytest.mark.slow
def test_pagerank_bit_identical_under_repartition(spark):
    orders, lineitem = _graph(spark)
    a = pagerank_suppliers(orders, lineitem, top=10).collect()
    b = pagerank_suppliers(
        orders.repartition(7), lineitem.repartition(5), top=10
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pagerank_bit_identical_under_broadcast_opt_in(spark, monkeypatch):
    """SORTIFY_PR_BROADCAST_MAX_NODES flips every per-iteration join from
    sort-merge to broadcast-hash; the exact-integer arithmetic is join-
    strategy-independent, so the vector must be bit-identical."""
    orders, lineitem = _graph(spark)
    a = pagerank_suppliers(orders, lineitem, top=10).collect()
    monkeypatch.setenv("SORTIFY_PR_BROADCAST_MAX_NODES", "1000000")
    b = pagerank_suppliers(orders, lineitem, top=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # below the cap the knob must be a no-op (falls back to the SMJ plan)
    monkeypatch.setenv("SORTIFY_PR_BROADCAST_MAX_NODES", "1")
    c = pagerank_suppliers(orders, lineitem, top=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in c]


def test_pagerank_convergence_stop_matches_fixed_iters(spark):
    """tol_units stops the loop exactly when the fixed-point L1 delta
    is within the tolerance, and the early-stopped vector equals the
    fixed-iteration run of the same length (the knob changes WHEN we
    stop, never the arithmetic).  A huge tolerance stops after one
    iteration; tol=0 runs until the vector is literally fixed."""
    orders, lineitem = _graph(spark)
    one = pagerank_suppliers(orders, lineitem, iters=1, top=10).collect()
    early = pagerank_suppliers(
        orders, lineitem, iters=50, top=10, tol_units=PR_SCALE * 10
    ).collect()
    assert [tuple(r) for r in early] == [tuple(r) for r in one]
    # exact fixed point: two long runs with tol 0 agree bit-for-bit
    fixa = pagerank_suppliers(
        orders, lineitem, iters=200, top=10, tol_units=0
    ).collect()
    fixb = pagerank_suppliers(
        orders, lineitem, iters=300, top=10, tol_units=0
    ).collect()
    assert [tuple(r) for r in fixa] == [tuple(r) for r in fixb]


@pytest.mark.slow
def test_pagerank_dangling_conserves_mass(spark):
    """With dangling=True total rank mass stays within integer-
    truncation distance of PR_SCALE (<= 2 units lost per node per
    iteration across the two DIVs), whereas the default variant leaks
    the suppliers' mass every iteration."""
    orders, lineitem = _graph(spark)
    # 3 customers + 3 suppliers = 6 nodes; top=10 returns suppliers
    # only, so re-derive total mass from an un-filtered variant run:
    # suppliers hold the dangling mass, customers only base + nothing.
    full = pagerank_suppliers(
        orders, lineitem, top=10, dangling=True
    ).collect()
    supp_mass = sum(r.pr_units for r in full)
    plain = pagerank_suppliers(orders, lineitem, top=10).collect()
    assert supp_mass > sum(r.pr_units for r in plain)
    # redistribution is still bit-identical under repartition
    again = pagerank_suppliers(
        orders.repartition(3), lineitem.repartition(9), top=10,
        dangling=True,
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in full]


def test_pagerank_checkpoint_cadence_identity(spark):
    """checkpoint_every is pure lineage maintenance: the result is
    bit-identical with and without it."""
    orders, lineitem = _graph(spark)
    a = pagerank_suppliers(orders, lineitem, top=10).collect()
    b = pagerank_suppliers(
        orders, lineitem, top=10, checkpoint_every=2
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
