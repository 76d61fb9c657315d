"""Deterministic sampling operators.

A training-data pipeline samples by *policy* (per-source mixture rates),
not by RNG: the sample must be stable under repartitioning, re-runs, and
backfills, and auditable row-by-row.  Hash-bucket sampling gives all
three (and an exact SQL oracle); ``df.sample(seed=)`` remains the
one-off exploratory variant (``sampled_scan``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket space for rate resolution: rates are exact to 1/1000.
BUCKETS = 1000


def hash_bucket(id_col: Column | str, buckets: int = BUCKETS) -> Column:
    """Stable per-row bucket in [0, buckets) from the md5 hex prefix of
    the string-rendered id — bit-identical in DuckDB as
    ``('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 7))::BIGINT %
    buckets``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(F.md5(c.cast("string").cast("binary")), 1, 7), 16, 10
        ).cast("bigint")
        % buckets
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    id_col: str,
) -> DataFrame:
    """Keep each row iff its id-hash bucket falls under its stratum's
    rate — the mixture resampler (e.g. keep 100% of curated sources,
    20% of web crawl).  Pure filter: no shuffle, no RNG, pushdown-safe,
    and the kept set only shrinks/grows per-stratum when rates change."""
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.filter(hash_bucket(id_col) < (rate * BUCKETS).cast("bigint"))


def stratified_oracle_predicate(
    strata_col: str, rates: dict[str, float], default_rate: float, id_col: str
) -> str:
    """DuckDB rendering of the :func:`stratified_hash_sample` filter."""
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v * BUCKETS)}" for k, v in sorted(rates.items())
    )
    return (
        f"('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 7))::BIGINT "
        f"% {BUCKETS} < CASE {strata_col} {cases} "
        f"ELSE {int(default_rate * BUCKETS)} END"
    )


def budget_balanced_rates(
    doc_tokens: DataFrame,
    strata_col: str,
    budget: int,
) -> DataFrame:
    """Per-stratum keep rates that split a global token ``budget``
    equally across strata: ``rate_s = min(1, (budget/n_strata) /
    tokens_s)``.  Input is ``(strata_col, tok)`` per document; output
    ``(strata_col, rate)`` — one tiny row per stratum.

    The n_strata count comes from an unpartitioned window over the
    ALREADY-AGGREGATED per-stratum frame (rows = number of strata, i.e.
    data sources — dozens, not documents), so the single-partition
    window is bounded by construction.
    """
    from pyspark.sql.window import Window

    per = doc_tokens.groupBy(strata_col).agg(
        F.sum(F.col("tok")).cast("bigint").alias("toks")
    )
    n = F.count(F.lit(1)).over(Window.partitionBy())
    # A zero-token stratum (empty or binary-only source) clamps to
    # keep-all: under ANSI mode the bare division would abort the job.
    return per.select(
        strata_col,
        F.when(F.col("toks") == 0, F.lit(1.0))
        .otherwise(
            F.least(
                F.lit(1.0),
                (F.lit(float(budget)) / n) / F.col("toks").cast("double"),
            )
        )
        .alias("rate"),
    )


def budget_balanced_sample(
    df: DataFrame,
    strata_col: str,
    tok_col: Column,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Keep each row iff its id-hash bucket clears its stratum's
    budget-derived rate — the self-tuning form of
    :func:`stratified_hash_sample`: rates follow the data (two-pass:
    tiny per-stratum aggregate, broadcast back, pure filter) instead of
    a hand-written policy table.  Deterministic end-to-end: same data +
    budget → same kept set, stable under repartitioning."""
    rates = budget_balanced_rates(
        df.select(strata_col, tok_col.alias("tok")), strata_col, budget
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(
            hash_bucket(id_col)
            < F.floor(F.col("rate") * BUCKETS).cast("bigint")
        )
        .drop("rate")
    )
