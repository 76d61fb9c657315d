"""Physical-plan regression tests: the properties SCALE.md claims are
machine-checked here so a refactor that silently loses pushdown, a
broadcast, or a bounded top-k gets caught at test time."""

from __future__ import annotations

import pytest

from sortify_spark.all_queries import REGISTRY
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def test_pricing_summary_pushdown_and_partial_agg(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan and "LessThanOrEqual" in plan
    assert "partial_" in plan  # map-side combine before the shuffle


def test_list_filter_paginate_is_bounded_topk(spark):
    plan = _plan(spark, "list_filter_paginate")
    assert "TakeOrderedAndProject" in plan  # no global sort
    assert _shuffles(plan) == 0


def test_regional_revenue_broadcasts_dimensions(spark):
    plan = _plan(spark, "regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_user_sessions_single_shuffle(spark):
    plan = _plan(spark, "user_sessions")
    assert _shuffles(plan) == 1  # windows + final agg reuse one partitioning


def test_two_stage_candidates_broadcast(spark):
    plan = _plan(spark, "two_stage_hybrid")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_keyword_topk_map_side_combine(spark):
    plan = _plan(spark, "keyword_topk")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_cube_expands_once_single_shuffle(spark):
    """CUBE must compile to one Expand (4 grouping sets) feeding one
    partial→final hash aggregate — four separate scans would be wrong."""
    plan = _plan(spark, "status_year_cube")
    assert "Expand" in plan
    assert _shuffles(plan) == 1
    assert "partial_" in plan


def test_daily_delta_windows_after_aggregate(spark):
    """lead/lag run over the ~2.4k-row daily aggregate, not the raw
    orders: exactly the agg shuffle plus the single-partition window
    exchange, and the window input is the aggregated side."""
    plan = _plan(spark, "daily_order_delta")
    assert "Window" in plan
    assert _shuffles(plan) == 2
    assert "partial_count" in plan  # agg happens below the window


def test_decontaminate_broadcast_semi_join(spark):
    """The benchmark shingle set broadcasts into a left-semi join — the
    training side must never shuffle for the join itself (its only
    Exchanges are the two projection-collapse barriers + final agg)."""
    plan = _plan(spark, "decontaminate_vs_benchmark")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_mixture_resample_is_pure_filter(spark):
    """Stratified hash sampling is a scan-side filter: exactly the one
    aggregation Exchange, no join, no window, no Python."""
    plan = _plan(spark, "mixture_resample")
    assert _shuffles(plan) == 1
    assert "Join" not in plan and "EvalPython" not in plan


@pytest.mark.parametrize(
    "name", ["pricing_summary", "quality_scores", "token_counts_bpe"]
)
def test_no_python_udf_in_jvm_only_queries(spark, name):
    """These queries must stay whole-stage JVM — a Python UDF sneaking in
    would show up as ArrowEvalPython/BatchEvalPython."""
    plan = _plan(spark, name)
    assert "EvalPython" not in plan


def test_simhash_banded_no_nested_loop(spark):
    """The rotated-band candidate join must stay an equi-join on
    (band_idx, band_val) — never a nested-loop over signature pairs."""
    plan = _plan(spark, "simhash_pairs_banded")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_recall_prunes_buckets(spark):
    """IVF side must restrict the scan to the probed buckets via a
    broadcast semi-join (the partition-pruning shape at scale).  The
    plan's only nested-loop joins are the documented broadcast 1-row
    query-vector crossJoins (score_vectors), never a data×data product."""
    plan = _plan(spark, "ivf_recall_at_10")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # every nested-loop is a Cross against an Identity-broadcast side
    # (the 1-row query), which is how Spark plans crossJoin(broadcast(q))
    assert plan.count("BroadcastNestedLoopJoin BuildRight, Cross") == plan.count(
        "BroadcastNestedLoopJoin"
    )


def test_suite_union_adds_no_python_udf(spark):
    """Suites re-run registered JVM-only plans; the union must not drag
    in Python evaluation."""
    for name in (
        "suite_scalar_aggs",
        "suite_group_aggs",
        "suite_relational",
        "suite_text",
        "suite_window_frames",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_curation_full_no_quadratic_joins(spark):
    """The six-stage pipeline must stay equi/semi/anti joins end-to-end:
    no nested-loop or cartesian anywhere in the composed plan."""
    plan = _plan(spark, "corpus_curation_full")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan  # near-dup drop + decontamination filters


def test_component_rep_broadcasts_drop_set(spark):
    """Final kept-corpus anti-join must broadcast the (small) drop set so
    the corpus never shuffles; no nested-loop joins anywhere."""
    plan = _plan(spark, "dedup_keep_component_rep")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_equi_joins_only(spark):
    """Batch-vs-corpus bucket join is an equi-join on (band_idx,
    band_key); verify and anti-join stages stay hash joins."""
    plan = _plan(spark, "incremental_dedup_new_docs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_repetition_signals_map_side_combine(spark):
    """Bigram counting must partial-aggregate before both shuffles and
    contain no Python UDF (pure zip_with/explode expressions)."""
    plan = _plan(spark, "repetition_signals")
    assert "partial_" in plan
    assert "Generate" in plan  # the bigram explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_sample_single_shuffle(spark):
    plan = _plan(spark, "stratified_sample_per_source")
    # One shuffle for the stratum window; the final presentation sort may
    # add one more, but no join may appear at all.
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_pii_scrub_audit_jvm_only_partial_agg(spark):
    """The PII sweep must stay whole-stage codegen (chained
    regexp_replace, no Python) with map-side combine before the one
    per-source shuffle.  r13: a gated fan-out (round-robin) exchange
    precedes the regex sweep so a tiny single-file scan no longer
    serializes every regex on one core (0.80 s → 0.68 s alternating
    A/B at sf0.1; no-op on a multi-split cluster scan) — so locally
    the plan carries exactly one extra RoundRobinPartitioning."""
    plan = _plan(spark, "pii_scrub_audit")
    assert "EvalPython" not in plan
    assert "partial_" in plan
    assert "RoundRobinPartitioning" in plan  # the gated fan-out
    assert _shuffles(plan) == 2  # fan-out + the per-source aggregate


def test_modk_cluster_broadcasts_centroids_no_window(spark):
    """modk assignment must broadcast the tiny centroid table and do the
    per-vector argmax as a map-side-combined aggregate — no window sort,
    no Python, no cartesian."""
    plan = _plan(spark, "cluster_organize_audit")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hierarchical_audit_no_quadratic_joins(spark):
    plan = _plan(spark, "hierarchical_audit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_audio_window_plan_jvm_only(spark):
    """Metadata-driven audio windowing never touches payload bytes —
    pure JVM explode, no Python evaluation."""
    plan = _plan(spark, "audio_window_plan")
    assert "EvalPython" not in plan
    assert "Generate" in plan  # the window explode


def test_e2e_expr_pipeline_python_free(spark):
    """The md5 expression encoder makes the ENTIRE e2e search plan pure
    Catalyst: ingest (chunk explode + embed + normalize), query embed,
    cosine scoring, fusion — no Python eval anywhere, candidates
    broadcast in the two-stage path."""
    plan = _plan(spark, "e2e_search_hybrid")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    stats_plan = _plan(spark, "e2e_index_stats")
    assert "EvalPython" not in stats_plan
    assert "partial_" in stats_plan  # map-side combine under the stats agg


def test_runtime_bloom_filter_prunes_selective_join(spark):
    """Scale contract: when a selective dimension filters a fact-table
    shuffle join (too big to broadcast), Catalyst's runtime bloom
    filter injects a pre-shuffle semi-filter on the fact scan — the
    fact side drops non-qualifying rows BEFORE the exchange, which at
    100 TB is the difference between shuffling the table and shuffling
    the match set.  Pinned here so a config/regression never silently
    turns it off for the engine's join plans."""
    import tempfile

    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        # local test data is tiny; drop the application-side size gate
        # (10 GB default) so the injection logic itself is what's tested
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with tempfile.TemporaryDirectory() as tmp:
            spark.range(50000).select(
                F.col("id"), (F.col("id") % 997).alias("k")
            ).write.parquet(f"{tmp}/fact")
            spark.range(200).select(
                (F.col("id") * 7).alias("k"), F.lit("d").alias("v")
            ).write.parquet(f"{tmp}/dim")
            fact = spark.read.parquet(f"{tmp}/fact")
            dim = spark.read.parquet(f"{tmp}/dim").filter("k % 3 = 0")
            plan = (
                fact.join(dim, "k")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "bloom_filter" in plan.lower(), plan[:2000]
            # correctness unaffected by the runtime filter
            assert fact.join(dim, "k").count() == (
                fact.join(F.broadcast(dim), "k").count()
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_span_removal_no_quadratic_joins(spark):
    """Boilerplate-span removal must stay equi/semi-join shaped: the
    span counting is a map-side-combined hash aggregate and the
    boilerplate set broadcasts back — never a cartesian or nested loop,
    never Python."""
    plan = _plan(spark, "common_span_removal")
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "partial_" in plan


def test_corpus_freq_vocab_join_and_partial_agg(spark):
    """CCNet tiering: vocab build map-side combines; the word join is an
    EXPLICIT broadcast (r5 fix — AQE's static SortMergeJoin materialized
    an occurrence-level Exchange before its runtime conversion could
    skip it), so the exploded word stream is never shuffled or sorted;
    ntile runs over the per-doc aggregate, not the exploded words."""
    plan = _plan(spark, "corpus_freq_buckets")
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "partial_" in plan
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_one_window_partitioning(spark):
    """Packing is one running-sum window per source plus the final
    aggregate — the groupBy(source, seq_id) must reuse the window's
    hash partitioning on source (partitioning on a key subset satisfies
    the agg's clustered distribution), so the only hash Exchange in the
    plan is the window's own; the second Exchange is the cosmetic final
    orderBy range sort."""
    plan = _plan(spark, "sequence_packing")
    assert "Window" in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert _shuffles(plan) == 2


def test_semdedup_blocked_equi_join(spark):
    """SemDeDup's pair space is label-blocked: the self-join must be an
    equi-join on label (Σ block², never n² via nested loop), with the
    id ordering and cosine threshold as post-join filters."""
    plan = _plan(spark, "semdedup_prune")
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan
    assert "EvalPython" not in plan


@pytest.mark.parametrize(
    "name", ["winnowing_pairs", "kmv_distinct_sketch", "profile_documents"]
)
def test_round4_tail_ops_stay_jvm_and_bounded(spark, name):
    """The closing round-4 operators must follow the same discipline:
    no cartesian/nested-loop joins, no Python in the plan, and partial
    aggregation below their shuffles."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "partial_" in plan


def test_profile_documents_single_scan(spark):
    """The profile must read the table ONCE: a single scan node feeding
    the wide aggregate (five per-column profiles would scan five
    times)."""
    plan = _plan(spark, "profile_documents")
    assert plan.count("Scan parquet") == 1


def test_hot_bucket_guard_preserves_pair_set(spark):
    """The runtime hot-bucket guard (banded_self_join_pairs) must emit
    EXACTLY the pair set of the unguarded equi-self-join on an
    adversarial corpus: 30% of rows share one boilerplate bucket (the
    templated-web shape), the rest spread normally.  Run with a cap
    that forces the split and with an effectively-infinite cap; the
    candidate sets must be identical, and hot_bucket_stats must name
    the flooded bucket."""
    import pyspark.sql.functions as F

    from sortify_spark.dedup import banded_self_join_pairs, hot_bucket_stats

    n = 400
    rows = [
        # bucket 0 is the boilerplate flood (30% of rows); others i%37
        (i, 0 if i % 10 < 3 else 1 + (i % 37)) for i in range(n)
    ]
    banded = spark.createDataFrame(rows, "id long, band_key long").withColumn(
        "band_idx", F.lit(0)
    )

    def pairs(cap, groups=4):
        return {
            (r["id_a"], r["id_b"])
            for r in banded_self_join_pairs(
                banded, hot_cap=cap, hot_groups=groups
            ).collect()
        }

    unguarded = pairs(cap=10**9)
    flood = sum(1 for _, b in rows if b == 0)
    assert len(unguarded) >= flood * (flood - 1) // 2
    for cap, groups in ((50, 4), (50, 7), (1, 3)):
        got = pairs(cap, groups)
        assert got == unguarded, f"cap={cap} groups={groups}"
    # every pair is ordered and unique
    assert all(a < b for a, b in unguarded)
    hot = hot_bucket_stats(banded, cap=50).collect()
    assert {(r["band_key"], r["bucket_size"]) for r in hot} == {(0, flood)}


def test_hot_bucket_guard_carries_payload_correctly(spark):
    """Carried columns must stay attached to THEIR row through the
    cross-group canonicalization swap (a mismatched carry would corrupt
    every downstream verify)."""
    import pyspark.sql.functions as F

    from sortify_spark.dedup import banded_self_join_pairs

    n = 60
    banded = spark.createDataFrame(
        [(i, 7, i * 11) for i in range(n)], "id long, blk long, payload long"
    )
    got = banded_self_join_pairs(
        banded,
        key_cols=("blk",),
        carry_cols=("payload",),
        hot_cap=5,
        hot_groups=4,
    ).collect()
    assert len(got) == n * (n - 1) // 2
    for r in got:
        assert r["id_a"] < r["id_b"]
        assert r["payload_a"] == r["id_a"] * 11
        assert r["payload_b"] == r["id_b"] * 11


def test_bigram_lm_quality_broadcast_lm_tables(spark):
    """CCNet-style bigram-LM scoring: the LM tables (bigram, unigram,
    vocab scalar, corpus mean) are broadcast, so the corpus-side bigram
    stream is never shuffled or sorted — explode -> broadcast hash
    joins -> map-side-combined per-doc agg.  No SMJ, no Python, no
    cartesian blowup (the only cross joins carry 1-row broadcast
    scalars).  r13: the full query checkpoints the per-doc frame (one
    evaluation feeds both the corpus-mean and the final aggregate), so
    the broadcast discipline is asserted on the scoring subtree
    (_bigram_per_doc) and the full query is checked above the
    checkpoint."""
    from sortify_spark.queries import _t
    from sortify_spark.queries_lm import _bigram_per_doc

    kernel = _bigram_per_doc(_t(spark, SF_DIR, "documents"))
    kplan = kernel._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in kplan
    assert "SortMergeJoin" not in kplan
    assert "CartesianProduct" not in kplan
    assert kplan.count("BroadcastHashJoin") >= 2
    assert "partial_" in kplan

    plan = _plan(spark, "bigram_lm_quality")
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fan_out_gated_on_partition_count(spark):
    """fan_out widens a single-partition frame to default parallelism
    and is an exact no-op (same plan object) on an already-parallel
    frame — the cluster-scale contract."""
    from sortify_spark.operators.partitioning import fan_out

    par = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame([(i,) for i in range(10)], ["x"]).coalesce(1)
    assert small.rdd.getNumPartitions() == 1
    widened = fan_out(small)
    assert widened.rdd.getNumPartitions() == par
    assert widened.count() == 10

    wide = spark.range(100).repartition(par)
    assert fan_out(wide) is wide


def test_pagerank_iterations_reuse_edge_partitioning(spark):
    """r14: the edge+degree frame and the node table are pre-hashed /
    pre-sorted on their join keys behind eager checkpoints, so the only
    per-iteration exchange left is the groupBy(dst) contrib aggregate —
    no iteration may re-shuffle the edge table (src) or the rank vector
    (id)."""
    plan = _plan(spark, "pagerank_suppliers")
    import re

    args = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert args, "expected the per-iteration contrib exchanges"
    assert set(args) == {"dst"}, f"unexpected exchange keys: {set(args)}"


def test_incremental_dedup_single_signature_scan(spark):
    """r14: the batch and corpus signature passes are fused into ONE
    corpus-wide pass split by filter — the plan must hold exactly one
    documents scan under the signature subtree plus the two fingerprint
    legs (3 distinct parquet scan operators total)."""
    df = REGISTRY["incremental_dedup_new_docs"].fn(spark, SF_DIR)
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    scans = set(re.findall(r"\((\d+)\) Scan parquet", buf.getvalue()))
    assert len(scans) <= 3, f"expected <=3 distinct scans, got {scans}"
