"""Layout proof: date-partitioned tables prune to the queried window.

SCALE.md claims time-series tables written with date partitions turn
every time-window predicate (F10) into partition pruning — this test
machine-checks it: the scan's PartitionFilters carry the date predicate
and the files read shrink to the matching partitions only.
"""

from __future__ import annotations

import pytest

import tempfile

import pyspark.sql.functions as F


def test_date_partition_pruning(spark):
    from sortify_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    with tempfile.TemporaryDirectory() as tmp:
        (
            events.withColumn("day", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(f"{tmp}/events_by_day")
        )
        part = spark.read.parquet(f"{tmp}/events_by_day")
        n_days = part.select("day").distinct().count()
        assert n_days > 3  # the pruning claim needs >1 partition to mean anything

        one_day = part.select(F.max("day").alias("d")).first()["d"]
        q = part.filter(F.col("day") == F.lit(one_day))
        plan = q._jdf.queryExecution().executedPlan().toString()
        # predicate reaches the scan as a partition filter, not a row filter
        assert "PartitionFilters: [" in plan and "day" in plan.split(
            "PartitionFilters"
        )[1][:200]
        # and the scan actually reads one partition's files
        files_read = q.select(
            F.input_file_name().alias("f")
        ).distinct().count()
        total_files = part.select(
            F.input_file_name().alias("f")
        ).distinct().count()
        assert files_read < total_files
        assert q.count() == part.filter(F.col("day") == one_day).count()


@pytest.mark.slow
def test_lsh_bucket_partition_pruning(spark):
    """SCALE.md claims the facade LSH probe becomes PARTITION PRUNING
    when the vector index is stored partitioned by bucket key: the
    multi-probe key set reaches the scan as a partition filter and the
    files read shrink to the probed buckets only."""
    from sortify_spark.pipelines import ingest_vectorize_expr
    from sortify_spark.search.knn import (
        embedding_mean,
        lsh_portable_key_centered,
    )
    from sortify_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    vec = ingest_vectorize_expr(docs, dim=16).filter(
        F.col("vtype") == "summary"
    )
    center = embedding_mean(vec)
    keyed = vec.crossJoin(F.broadcast(center)).withColumn(
        "lsh_bucket", lsh_portable_key_centered("embedding", "c", 4)
    ).drop("c")
    with tempfile.TemporaryDirectory() as tmp:
        keyed.write.mode("overwrite").partitionBy("lsh_bucket").parquet(
            f"{tmp}/vec_by_bucket"
        )
        part = spark.read.parquet(f"{tmp}/vec_by_bucket")
        n_buckets = part.select("lsh_bucket").distinct().count()
        assert n_buckets > 2  # pruning needs multiple partitions

        # a multi-probe set: some bucket + its one-bit flips
        probe = [3, 2, 1, 7, 11]
        q = part.filter(F.col("lsh_bucket").isin(probe))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "lsh_bucket" in plan.split(
            "PartitionFilters"
        )[1][:250]
        files_read = q.select(
            F.input_file_name().alias("f")
        ).distinct().count()
        total_files = part.select(
            F.input_file_name().alias("f")
        ).distinct().count()
        assert files_read < total_files
