"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`sortify_spark.queries`: every implemented operator
from SURVEY.md §2 is registered there with its Spark plan and (where
SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sortify_spark.all_queries import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the COMPLETE corpus-curation pipeline
    (exact dedup → MinHash-LSH near-dup drop → benchmark decontamination
    → quality/language filter → deterministic mixture resample →
    per-source token budget) — the engine's training-data use case in
    one lazy plan."""
    return REGISTRY["corpus_curation_full"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
