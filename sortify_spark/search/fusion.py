"""Rank-fusion search strategies (SURVEY.md §2.5 W3-W6, §2.10 V3-V7).

Every strategy operates on generic *scored lists* — DataFrames of
``(id, score)`` — so the same plans fuse vector scores, keyword scores,
or any future scorer.  All are pure DataFrame plans: rank windows, a
full-outer join, and a TakeOrdered; Catalyst schedules the branches
independently (the reference needed explicit asyncio.gather,
``enhanced_search_service.py:293-301``).

Reference defaults: RRF k=60, weights {summary: 2.0, chunks: 1.0}
(``config.py:42-43``).  The reference ALSO carries a conflicting service
fallback {0.4, 0.6} (``enhanced_search_service.py:30-31``) — per
SURVEY.md §7.3 the engine exposes ONE explicit parameter defaulting to
the config values and documents the discrepancy here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60
RRF_WEIGHT_SUMMARY = 2.0
RRF_WEIGHT_CHUNKS = 1.0
#: Multi-query rewrite-variant weights (``search_weight_config.py:15-19``).
VARIANT_WEIGHTS = (1.3, 1.1, 1.0)


#: Hard bound on ``add_rank`` input size: a global rank window is a
#: single-partition sort, which is only acceptable on top-k-bounded
#: lists.  ``add_rank`` enforces the bound structurally (TakeOrdered
#: pre-limit) so an unbounded caller can't silently plan a 1-partition
#: sort over a large input at scale.
ADD_RANK_MAX_ROWS = 10_000


def add_rank(
    scored: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    input_bound: int | None = ADD_RANK_MAX_ROWS,
) -> DataFrame:
    """W1: dense 1-based rank, deterministic (score desc, id asc).

    Contract: inputs are scored top-k lists with UNIQUE ids (one row per
    candidate).  The global window is a single-partition sort, so the
    input is structurally bounded first: ``orderBy().limit(input_bound)``
    plans a distributed TakeOrdered, and the window then runs over at
    most ``input_bound`` rows.  Ranks for the surviving rows are
    identical to the unbounded form (same total order).  Pass
    ``input_bound=None`` only when the caller proves boundedness itself.
    """
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    if input_bound is not None:
        scored = scored.orderBy(*order).limit(input_bound)
    w = Window.orderBy(*order)
    return scored.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    summary_scored: DataFrame,
    chunk_scored: DataFrame,
    id_col: str = "id",
    k: int = RRF_K,
    w_summary: float = RRF_WEIGHT_SUMMARY,
    w_chunks: float = RRF_WEIGHT_CHUNKS,
    top_k: int = 10,
) -> DataFrame:
    """W6/V4 (J3 rank alignment): Reciprocal Rank Fusion.

    ``score(d) = Σᵢ wᵢ/(k + rankᵢ(d))`` over both ranked lists, absent
    ranks contribute 0 (``enhanced_search_service.py:379-459``).  Result
    carries each side's contribution for explainability, like the
    reference's fusion stats.

    The rank alignment (J3) is a union + groupBy, not a full-outer
    join: identical results (each id keeps its per-source rank, absent
    sides stay null), but the plan is one map-side-combinable hash
    aggregate instead of a sort-merge join — no per-side sort, and it
    scales to fusing N sources with the same single shuffle.

    Input contract: each scored list has UNIQUE ids (one row per doc —
    dedupe multi-chunk lists to the best chunk per doc first, as the
    reference does in ``enhanced_search_service.py:404-419``).  The
    union+groupBy form equals the full-outer join ONLY under that
    contract; defensively, duplicate ids take their BEST (minimum) rank
    per source rather than failing silently with the worst.
    """
    a = add_rank(summary_scored, id_col).select(
        F.col(id_col),
        F.col("rank").alias("rank_summary"),
        F.lit(None).cast("int").alias("rank_chunks"),
    )
    b = add_rank(chunk_scored, id_col).select(
        F.col(id_col),
        F.lit(None).cast("int").alias("rank_summary"),
        F.col("rank").alias("rank_chunks"),
    )
    fused = (
        a.unionByName(b)
        .groupBy(id_col)
        .agg(
            F.min("rank_summary").alias("rank_summary"),
            F.min("rank_chunks").alias("rank_chunks"),
        )
        .select(
            id_col,
            "rank_summary",
            "rank_chunks",
            F.round(
                F.coalesce(w_summary / (k + F.col("rank_summary")), F.lit(0.0))
                + F.coalesce(w_chunks / (k + F.col("rank_chunks")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(top_k)


def add_rank_grouped(
    scored: DataFrame,
    group_col: str = "query_id",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Per-group dense rank (score desc, id asc) — the batched twin of
    :func:`add_rank`: the window partitions by ``group_col``, so it is
    a distributed sort across groups, never the single-partition global
    sort ``add_rank`` must structurally bound.  Inputs are per-group
    top-k lists by contract (the caller's probe/topk already bounded
    each group)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w))


def rrf_fuse_many(
    summary_scored: DataFrame,
    chunk_scored: DataFrame,
    group_col: str = "query_id",
    id_col: str = "id",
    k: int = RRF_K,
    w_summary: float = RRF_WEIGHT_SUMMARY,
    w_chunks: float = RRF_WEIGHT_CHUNKS,
    top_k: int = 10,
) -> DataFrame:
    """BATCHED RRF: fuse N queries' rank-list pairs in ONE plan
    (VERDICT r8 next #2) — :func:`rrf_fuse`'s union + groupBy shape
    with ``group_col`` joined into every key, so the single shuffle
    now co-partitions by (query, id) and the final TakeOrdered becomes
    a per-query rank window.  Inputs: (group, id, score) frames whose
    per-group lists are bounded and have unique ids per group (the
    same contract as ``rrf_fuse``, per group).  Output: per group the
    SAME rows rrf_fuse returns for that group's pair, with ``rnk``
    1..top_k."""
    a = add_rank_grouped(summary_scored, group_col, id_col).select(
        group_col,
        id_col,
        F.col("rank").alias("rank_summary"),
        F.lit(None).cast("int").alias("rank_chunks"),
    )
    b = add_rank_grouped(chunk_scored, group_col, id_col).select(
        group_col,
        id_col,
        F.lit(None).cast("int").alias("rank_summary"),
        F.col("rank").alias("rank_chunks"),
    )
    fused = (
        a.unionByName(b)
        .groupBy(group_col, id_col)
        .agg(
            F.min("rank_summary").alias("rank_summary"),
            F.min("rank_chunks").alias("rank_chunks"),
        )
        .select(
            group_col,
            id_col,
            "rank_summary",
            "rank_chunks",
            F.round(
                F.coalesce(w_summary / (k + F.col("rank_summary")), F.lit(0.0))
                + F.coalesce(w_chunks / (k + F.col("rank_chunks")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return fused.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= top_k
    )


def two_stage_hybrid(
    summary_scored: DataFrame,
    chunk_scored_fn,
    id_col: str = "id",
    stage1_k: int = 10,
    top_k: int = 5,
    materialize_stage1: bool = False,
) -> DataFrame:
    """V3: coarse→fine two-stage search with dedup + backfill.

    Stage 1 takes the top ``stage1_k`` summary candidates; stage 2 scores
    chunks restricted to those candidates (``chunk_scored_fn(candidate_ids)``
    — the semi-join pushdown of J1); results dedup per doc preferring the
    stage-2 (fine) score, and stage-1 order backfills when stage 2 returns
    fewer than ``top_k`` docs (W3 contract,
    ``enhanced_search_service.py:126-203,508-548``).

    Determinism contract (§7.3 hard-part 2): stage-2 rows rank before
    backfill rows; within a tier, (score desc, id asc).

    ``materialize_stage1``: lazily checkpoint the (≤ stage1_k rows)
    stage-1 frame so its scoring + global-rank subtree evaluates ONCE —
    it otherwise runs twice (candidate semi-join + backfill union leg).
    Worth it when the summary scorer is expensive (the facade's
    interpreted cosine fold over the persisted vectors table: measured
    2.10 → 1.95 s med-of-meds, winning every alternating block); a
    measured LOSS for cheap scorers (the registry query's small
    embeddings scan: 0.86 → 0.92 s — the materialization barrier costs
    more than the saved re-evaluation), hence opt-in, default off.
    Values are unchanged either way (same expressions, same rows).
    """
    stage1 = add_rank(summary_scored, id_col).filter(
        F.col("rank") <= stage1_k
    )
    if materialize_stage1:
        stage1 = stage1.localCheckpoint(eager=False)
    candidates = stage1.select(id_col)
    stage2 = chunk_scored_fn(candidates)

    s2 = stage2.select(
        F.col(id_col), F.col("score"), F.lit(0).alias("tier")
    )
    s1 = stage1.select(
        F.col(id_col), F.col("score"), F.lit(1).alias("tier")
    )
    unioned = s2.unionByName(s1)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tier").asc(), F.col("score").desc()
    )
    deduped = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return deduped.orderBy(
        F.col("tier").asc(), F.col("score").desc(), F.col(id_col).asc()
    ).limit(top_k)


def two_stage_hybrid_many(
    summary_scored: DataFrame,
    chunk_scored_fn,
    group_col: str = "query_id",
    id_col: str = "id",
    stage1_k: int = 10,
    top_k: int = 5,
    materialize_stage1: bool = False,
) -> DataFrame:
    """BATCHED :func:`two_stage_hybrid`: N queries' coarse→fine search
    in ONE plan per stage.  ``chunk_scored_fn`` receives the whole
    batch's (group, id) candidate PAIRS (each query's stage-1 top
    ``stage1_k``) and must return per-(group, id) fine scores
    restricted to those pairs — the batched semi-join pushdown.
    Dedup-prefer-stage-2, then per-group (tier asc, score desc, id
    asc) rank ≤ top_k — per group identical to the single-query
    operator's rows, with ``rnk`` added.

    ``materialize_stage1``: lazily checkpoint the (≤ N·stage1_k rows)
    stage-1 frame so its scoring + per-group-rank subtree evaluates
    ONCE instead of twice (candidate semi-join + backfill union leg) —
    the batched twin of :func:`two_stage_hybrid`'s knob, same
    opt-in-per-measured-scorer contract, values unchanged either way."""
    stage1 = add_rank_grouped(summary_scored, group_col, id_col).filter(
        F.col("rank") <= stage1_k
    )
    if materialize_stage1:
        stage1 = stage1.localCheckpoint(eager=False)
    candidates = stage1.select(group_col, id_col)
    stage2 = chunk_scored_fn(candidates)
    s2 = stage2.select(
        group_col, id_col, F.col("score"), F.lit(0).alias("tier")
    )
    s1 = stage1.select(
        group_col, id_col, F.col("score"), F.lit(1).alias("tier")
    )
    unioned = s2.unionByName(s1)
    w = Window.partitionBy(group_col, id_col).orderBy(
        F.col("tier").asc(), F.col("score").desc()
    )
    deduped = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w2 = Window.partitionBy(group_col).orderBy(
        F.col("tier").asc(), F.col("score").desc(), F.col(id_col).asc()
    )
    return deduped.withColumn("rnk", F.row_number().over(w2)).filter(
        F.col("rnk") <= top_k
    )


def traditional_merge_many(
    summary_scored: DataFrame,
    chunk_scored: DataFrame,
    group_col: str = "query_id",
    id_col: str = "id",
    top_k: int = 10,
) -> DataFrame:
    """BATCHED :func:`traditional_merge`: per-(group, id) max score,
    per-group rank ≤ top_k — one shuffle for the whole batch."""
    unioned = summary_scored.select(
        group_col, id_col, "score"
    ).unionByName(chunk_scored.select(group_col, id_col, "score"))
    merged = unioned.groupBy(group_col, id_col).agg(
        F.max("score").alias("score")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return merged.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= top_k
    )


def traditional_merge(
    summary_scored: DataFrame,
    chunk_scored: DataFrame,
    id_col: str = "id",
    top_k: int = 10,
) -> DataFrame:
    """V5: legacy strategy — union both lists, keep per-doc max score,
    sort desc, limit (``qa_search_coordinator.py:207-269``)."""
    unioned = summary_scored.select(id_col, "score").unionByName(
        chunk_scored.select(id_col, "score")
    )
    merged = unioned.groupBy(id_col).agg(F.max("score").alias("score"))
    return merged.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(top_k)


def multi_query_merge(
    variant_scored: list[DataFrame],
    id_col: str = "id",
    weights: tuple[float, ...] = VARIANT_WEIGHTS,
    top_k: int = 10,
) -> DataFrame:
    """V6/W4: N rewritten-query result lists, weighted by variant index,
    merged keeping the max weighted score per doc
    (``qa_search_coordinator.py:119-205`` + F18 weights)."""
    weighted = [
        df.select(
            F.col(id_col),
            F.round(F.col("score") * weights[min(i, len(weights) - 1)], 6).alias(
                "score"
            ),
        )
        for i, df in enumerate(variant_scored)
    ]
    out = weighted[0]
    for w in weighted[1:]:
        out = out.unionByName(w)
    merged = out.groupBy(id_col).agg(F.max("score").alias("score"))
    return merged.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(top_k)


def diversity_reselect(
    rows: list,
    text_key: str,
    top_k: int,
    overlap_limit: int = 5,
    prefix_tokens: int = 10,
) -> list:
    """O6: greedy diversity re-selection — drop a result when ≥
    ``overlap_limit`` of its first ``prefix_tokens`` tokens were already
    seen (``search_strategy.py:44-73``).

    Inherently sequential-greedy; the reference caps candidates at ~50, so
    this deliberately runs driver-side over an already-collected,
    k-bounded list (documented non-distributed — SURVEY.md §7.3 #6).
    """
    seen: set[str] = set()
    out = []
    for row in rows:
        toks = (row[text_key] or "").split()[:prefix_tokens]
        overlap = sum(1 for t in toks if t in seen)
        if overlap >= overlap_limit:
            continue
        seen.update(toks)
        out.append(row)
        if len(out) >= top_k:
            break
    return out


def select_strategy(granularity: str | None) -> str:
    """V7: plan-time strategy dispatch (``search_strategy.py:12-41``)."""
    mapping = {
        "thematic": "summary_only",
        "detailed": "rrf_fusion",
        "unknown": "rrf_fusion",
        "keyword_enhanced_rrf": "rrf_fusion",
    }
    return mapping.get(granularity or "", "hybrid")
