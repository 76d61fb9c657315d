#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
``{"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "queries_best2": {...},
   "value_best2": N, "queries_norm": {...}, "value_norm": N,
   "anchor": {...}, "protocol": {...}, "sf": 0.1}``

``queries``/``value`` are median-of-5 consecutive warm reps per query
(robust to the 2x host-noise band this box shows on identical plans);
``queries_best2``/``value_best2`` replicate the rounds-1..10 best-of-2
protocol for cross-round continuity.  Each query is forced with a
noop-format write (full plan execution, no driver-side result
materialization cost skewing the numbers).

``queries_norm``/``value_norm`` are SAME-SESSION ANCHOR-NORMALIZED
seconds (VERDICT r11 #2): median-of-5 cannot fix HOURS-scale host
drift (round 11's end-of-round recording was a uniform ~1.3x median
inflation across all 62 common queries, movers to 3.9x, on
byte-equivalent plans — all phantom, adjudicated by judge-pinned
reps).  A small fixed anchor set of stable relational plans is timed
by the same run; ``host_factor`` = geometric mean of (this session's
anchor median / the anchor's pinned reference median from
``BASELINE_MEDIAN.json``, the judged same-code mid-round-11
recording); every query's normalized second is raw / host_factor.
Cross-round comparison reads the normalized column — a real
regression moves a query AGAINST the anchors, host drift moves
everything WITH them.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sortify_spark.all_queries import REGISTRY  # noqa: E402
from sortify_spark.session import get_spark  # noqa: E402

#: One per operator class: scan-agg, filter+page, conditional counts,
#: time bucketing, explode+topk, star join, join+topk, window, knn,
#: fusion, two-stage, LSH dedup, clustering assignment, quality scoring,
#: exact dedup, chunking UDF.
HEADLINE = (
    "pricing_summary",
    "list_filter_paginate",
    "dashboard_counts",
    "daily_trend",
    "keyword_topk",
    "regional_revenue",
    "revenue_topk_orders",
    "top_order_per_customer",
    "knn_bruteforce",
    "knn_bruteforce_np",
    "asof_join_attribution",
    "range_join_clicks_1h",
    "rrf_fusion",
    "two_stage_hybrid",
    "minhash_lsh_pairs",
    "centroid_assign",
    "quality_scores",
    "dedup_exact_stats",
    "chunk_documents",
    "retrieval_metrics",
    "conversation_counters",
    "orders_rollup",
    "cluster_per_owner",
    "semantic_search_hybrid",
    "user_sessions",
    "latency_percentiles",
    "token_counts_bpe",
    "salted_join_revenue",
    "distinct_users_by_type",
    "decontaminate_vs_benchmark",
    "mixture_resample",
    "corpus_curation",
    "neardup_components",
    "repetition_signals",
    "incremental_dedup_new_docs",
    # round 3: full-corpus codegen PII sweep; distributed deterministic
    # clustering kernel + tier triage
    "pii_scrub_audit",
    "cluster_organize_audit",
    # round 4: the e2e facade search on the pure-Catalyst md5 expression
    # encoder (ingest + embed + two-stage fusion, zero Python in plan);
    # the versioned store's CDC classification kernel (full-outer join +
    # null-safe compare over events); the z-order Morton-key kernel.
    "e2e_search_hybrid",
    "cdc_classify",
    "zorder_cells",
    # round 4 (second half): the published-pipeline curation quartet —
    # C4 boilerplate spans, CCNet frequency tiers, GPT sequence packing,
    # SemDeDup semantic pruning (queries_curation2.py).
    "common_span_removal",
    "corpus_freq_buckets",
    "sequence_packing",
    "semdedup_prune",
    "semdedup_prune_np",
    "bpe_train_merges",
    "kmv_distinct_sketch",
    "winnowing_pairs",
    "profile_documents",
    "ngram_novelty",
    "contamination_fraction",
    # round 7: held-out bigram-LM quality scoring (broadcast LM tables,
    # corpus bigram stream never shuffled)
    "bigram_lm_quality",
    # round 7: fixed-memory sketches — count-min heavy-hitter audit,
    # Bloom pre-filter join (probe side never shuffles), DSIR hashed
    # n-gram importance weights (broadcast ratio table)
    "countmin_word_counts",
    "bloom_prefilter_join",
    "dsir_importance_weights",
    # round 7: strict event-time-ordered funnel, one event-stream shuffle
    "funnel_conversion",
    # round 7: lexical retrieval + the lexical x dense hybrid fusion
    "bm25_topk",
    "hybrid_lexical_semantic_rrf",
    # round 7: exact Jaccard join via PPJoin prefix filtering
    "jaccard_prefix_join",
    # round 7: iterative-graph power iteration (5 joins over the reused
    # edge+degree frame, exact integer fixed point); blocked Levenshtein
    # record linkage over the name vocabulary; calendar-spine gap fill
    "pagerank_suppliers",
    "fuzzy_link_parts",
    "gap_fill_daily",
    # round 7: component-atomic train/val/test split with in-plan
    # cross-split audit
    "leakage_safe_split",
    # round 7: incremental MV maintenance (base ⊕ delta partial merge)
    "mv_merge_daily",
    # round 7: Gopher rule battery (row-local codegen, one agg)
    "gopher_quality_rules",
    # round 7: Dolma paragraph-level keep-first dedup with rebuilt-text
    # hash audit (combiner-collapsed winner agg)
    "paragraph_dedup_keep_first",
    # round 7: dedup lineage (dropped -> rep + direct-jaccard audit)
    "dedup_attribution",
    # round 7: decontamination attribution (train doc -> benchmark item)
    "contamination_attribution",
    # round 8: exact substring dedup (Lee et al. window granularity;
    # one map-side-combinable wide shuffle + interval-merge rebuild)
    "substring_dedup_keep_first",
    # round 9: batched lexical serving through the persisted artifact
    # (build + 3-query probe in one plan — the semantic_search_many
    # keyword shape, timed end-to-end including the index build)
    "bm25_batched_probe",
)

#: Same-session drift anchors (VERDICT r11 #2): stable, pure-relational
#: plans untouched since early rounds, spanning scan-agg, window,
#: event-ordered shuffle, and star-join shapes so no single shape's
#: noise dominates the geomean.  Reference medians are pinned from
#: BASELINE_MEDIAN.json (sf0.1, judged same-code mid-round-11
#: recording, the protocol's fixed point) — update them ONLY if the
#: anchor queries' plans change, never to chase drift.
ANCHOR_REF = {
    "pricing_summary": 1.141,
    "user_sessions": 0.235,
    "funnel_conversion": 0.414,
    "regional_revenue": 1.620,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("sortify-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every headline plan once at the measured SF. This
    # compiles the generated code, JITs the hot paths, and spawns the
    # Python UDF workers — timings below then measure steady-state
    # throughput, not first-run JVM compilation (SCALE.md "known
    # trade-offs"; warming at a smaller SF is NOT equivalent because AQE
    # picks different physical plans per data size).
    for name in HEADLINE:
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # warm-up is best-effort; the measured run reports errors

    # MEDIAN-OF-5 CONSECUTIVE warm reps per query (primary metric), with
    # best-of-2 (min of the first two reps — the round-1..10 protocol)
    # kept alongside for cross-round continuity.  Why the change: two
    # rounds running, single queries flagged 2-3x "regressions" on
    # byte-identical plans that pinned re-measurement refuted
    # (chunk_documents r9, dedup_exact_stats r10) — host noise on this
    # box swings identical-plan stages up to 2x, and min-of-2 has no
    # defense against both draws landing high.  The median of 5 warm
    # reps is robust to 2 bad draws; the global warm-up pass above is
    # the discarded cold pass (codegen/JIT/UDF-worker spawn).
    # Running each query's repetitions back-to-back gives every rep
    # identical preconditions (the first run of a query after a heavy
    # neighbor pays that neighbor's GC debt — round-1 lesson).
    # Per-query fault isolation: one broken query must not abort the
    # whole bench (round 2 lost its entire perf signal to a single
    # analysis exception).  Failures report as {"name": "error: ..."}
    # and are excluded from the totals.
    import gc
    import statistics

    N_REPS = 5
    timings: dict[str, object] = {}
    timings_best2: dict[str, object] = {}
    errors: dict[str, str] = {}
    #: queries that reported a number from FEWER than N_REPS reps
    #: (a later rep raised): {name: {"reps_ok": n, "error": msg}}
    partial: dict[str, dict] = {}

    for name in HEADLINE:
        # Release the previous query's localCheckpoint blocks before
        # timing the next one: checkpointed RDDs are unpersisted by the
        # ContextCleaner only after their Python DataFrame is GC'd, and
        # with 60+ queries x N passes the accumulated storage blocks
        # steal execution memory from later queries (measured: a 1.3-3x
        # systematic drift of the common set as the headline list grew).
        # Per-query isolation is the point of the harness — cross-query
        # interference is a harness artifact, not plan cost.  (A
        # System.gc() here as well was measured WORSE — the forced full
        # collections cost more than the freed blocks bought back;
        # python GC + the ContextCleaner's own cadence is the sweet
        # spot: common-set ratio vs r6 was 1.21 with this line and 1.63
        # with the JVM GC added.)
        fn = REGISTRY[name].fn
        reps: list[float] = []
        for _ in range(N_REPS):
            # every rep must run free of the prior rep's retained blocks
            gc.collect()
            try:
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                reps.append(round(time.time() - t0, 3))
            except Exception as exc:  # noqa: BLE001 — report, keep going
                errors[name] = f"error: {type(exc).__name__}: {exc}"[:300]
                break
        if reps:
            # A flaky later repetition must not discard valid timings —
            # report whatever measurements exist, but SAY SO: a median
            # of 2 surviving reps must not masquerade as the full
            # 5-rep protocol (the whole point of the protocol change).
            timings[name] = round(statistics.median(reps), 3)
            timings_best2[name] = min(reps[:2])
            if name in errors:
                partial[name] = {
                    "reps_ok": len(reps),
                    "error": errors[name],
                }
    for name, msg in errors.items():
        if name not in timings:
            timings[name] = msg
            timings_best2[name] = msg

    total = round(
        sum(v for v in timings.values() if isinstance(v, float)), 3
    )
    total_best2 = round(
        sum(v for v in timings_best2.values() if isinstance(v, float)), 3
    )

    # -- same-session anchor normalization (VERDICT r11 #2) -----------
    # host_factor = geomean(anchor_now / anchor_ref) over the anchors
    # that produced a number this session; 1.0 means this session ran
    # at the reference recording's effective throughput.  Normalized
    # seconds divide the drift out so cross-round deltas isolate PLAN
    # changes: a uniform host slowdown moves raw numbers and anchors
    # together and cancels; a real regression moves one query against
    # the anchors and survives.
    import math

    anchor_now = {
        a: timings[a]
        for a in ANCHOR_REF
        # a 0.0 median (degenerate timing) would blow up the geomean's
        # log — treat it like a failed anchor
        if isinstance(timings.get(a), float) and timings[a] > 0
    }
    if abs(sf - 0.1) > 1e-9:
        # the pinned refs are sf0.1 medians — at any other SF the
        # ratio would conflate data scale with host drift; report raw
        anchor_now = {}
    if anchor_now:
        host_factor = round(
            math.exp(
                sum(
                    math.log(anchor_now[a] / ANCHOR_REF[a])
                    for a in anchor_now
                )
                / len(anchor_now)
            ),
            4,
        )
    else:  # every anchor failed — report raw-equal, flag loudly
        host_factor = 1.0
    timings_norm = {
        name: round(v / host_factor, 3) if isinstance(v, float) else v
        for name, v in timings.items()
    }
    total_norm = round(
        sum(v for v in timings_norm.values() if isinstance(v, float)), 3
    )
    # Key ORDER and ENCODING matter downstream (VERDICT r12 #3): the
    # driver's recorder keeps only the last 2,000 chars of this line,
    # which truncated the per-query normalized map to ~47 of 70
    # entries in BENCH_r12.  ``queries_norm`` — the map cross-round
    # comparison actually reads — is therefore emitted LAST, and the
    # line uses compact separators (the 70-entry map is ~2,010 chars
    # with default separators, ~1,870 compact — the difference is
    # exactly whether the tail window carries it whole); the raw/best2
    # maps (reconstructable as norm × host_factor) sit earliest in the
    # truncation shadow.
    payload = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "value_best2": total_best2,
        "value_norm": total_norm,
        "partial_reps": partial,
        "protocol": {
            "primary": "median",
            "reps": N_REPS,
            "warmup": "one discarded cold pass per query",
            "best2": "min of first 2 reps (rounds 1-10 protocol)",
            "norm": "sec / host_factor; host_factor = geomean("
            "anchor median this session / pinned ref median)",
        },
        "sf": sf,
        "queries": timings,
        "queries_best2": timings_best2,
        "anchor": {
            "host_factor": host_factor,
            "anchors_sec": anchor_now,
            "ref_sec": ANCHOR_REF,
            "ref_source": "BASELINE_MEDIAN.json (same-code "
            "mid-round-11 recording)",
            "ref_sf": 0.1,
            "anchors_failed": sorted(set(ANCHOR_REF) - set(anchor_now)),
        },
        "queries_norm": timings_norm,
        # duplicated scalar AFTER the map: the tail window must carry
        # the factor that reconstructs raw seconds (raw = norm × hf)
        # even when the full anchor block above is truncated away
        "hf": host_factor,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # Belt and braces for the same verdict item: persist the COMPLETE
    # record next to this script so a judge can always read the full
    # 70-query maps even if the driver's stdout window shrinks.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_FULL_latest.json",
            ),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # read-only deployment: stdout line is still complete
    print(line)


if __name__ == "__main__":
    main()
