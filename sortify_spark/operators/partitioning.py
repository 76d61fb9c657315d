"""Partition-shape helpers for interpreter-heavy kernels.

Higher-order Catalyst expressions (``transform``/``filter``/
``aggregate`` lambdas, ``array_intersect``) are evaluated interpreted,
row-at-a-time — outside whole-stage codegen.  A small single-file scan
arrives as ONE partition, so that work serializes on one core however
many the session has (SCALE.md "Interpreted higher-order expressions
are the new UDF").  ``fan_out`` is the gated fix: repartition only
when the scan has fewer partitions than the session's parallelism, so
it is a no-op at cluster scale where the scan already has thousands of
input splits, and a full-width win on a local single-file corpus.

It must be applied to the RAW input BELOW the heavy projection — a
repartition above it shuffles the computed arrays but still runs the
projection inside the single scan task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff it
    currently has fewer partitions (tiny-scan guard; cluster no-op)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
