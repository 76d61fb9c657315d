"""Filter builder + lookups + projections (SURVEY.md §2.2, P1-P10).

The reference's "logical plan" is a MongoDB filter document built by
``build_document_filter`` (reference ``backend/app/crud/crud_documents.py:24-67``)
and ``build_log_filter`` (``backend/app/crud/crud_logs.py:41-66``).  Here the
same conjunctive semantics compile to a single Spark ``Column`` predicate, so
Catalyst pushes every conjunct down to the parquet scan (check
``PushedFilters`` in ``.explain``) — the Spark analogue of the reference
relying on Mongo secondary indexes (``backend/app/db/db_init.py:29-42``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class DocumentFilter:
    """Conjunctive document filter (P1).

    Mirrors reference ``crud_documents.py:24-67``: equality on owner /
    device, status IN-list, case-insensitive filename substring (regex
    escaped), tag array-overlap, cluster id equality, 3-way
    null-or-missing clustering_status, enriched-data null checks.
    """

    owner_id: str | None = None
    uploader_device_id: str | None = None
    status_in: list[str] | None = None
    filename_contains: str | None = None
    tags_include: list[str] | None = None
    cluster_id: str | None = None
    clustering_status: str | None = None  # 'pending' matches NULL too
    has_enriched_data: bool | None = None
    extra: list[Column] = field(default_factory=list)

    # column names are configurable so the same builder serves any table
    owner_col: str = "owner_id"
    filename_col: str = "filename"

    def predicate(self) -> Column:
        conjuncts: list[Column] = [F.lit(True)]
        if self.owner_id is not None:
            # Tenant isolation is a mandatory predicate on every scan (P9,
            # reference ``core/ownership_checker.py``).
            conjuncts.append(F.col(self.owner_col) == F.lit(self.owner_id))
        if self.uploader_device_id is not None:
            conjuncts.append(
                F.col("uploader_device_id") == F.lit(self.uploader_device_id)
            )
        if self.status_in:
            conjuncts.append(F.col("status").isin(self.status_in))
        if self.filename_contains is not None:
            # Reference uses a re.escape'd case-insensitive $regex
            # (``crud_documents.py:40``); lower+contains is the pushdown-
            # friendly equivalent for a literal substring.
            conjuncts.append(
                F.lower(F.col(self.filename_col)).contains(
                    self.filename_contains.lower()
                )
            )
        if self.tags_include:
            conjuncts.append(
                F.arrays_overlap(
                    F.col("tags"),
                    F.array(*[F.lit(t) for t in self.tags_include]),
                )
            )
        if self.cluster_id is not None:
            conjuncts.append(F.col("cluster_id") == F.lit(self.cluster_id))
        if self.clustering_status is not None:
            col = F.col("clustering_status")
            if self.clustering_status == "pending":
                # Reference treats missing/null as pending via a 3-way $or
                # (``crud_documents.py:52-58``).
                conjuncts.append(col.isNull() | (col == F.lit("pending")))
            else:
                conjuncts.append(col == F.lit(self.clustering_status))
        if self.has_enriched_data is True:
            conjuncts.append(F.col("enriched_json").isNotNull())
        elif self.has_enriched_data is False:
            conjuncts.append(F.col("enriched_json").isNull())
        conjuncts.extend(self.extra)
        out = conjuncts[0]
        for c in conjuncts[1:]:
            out = out & c
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate())


def icontains(col: Column | str, needle: str) -> Column:
    """Case-insensitive literal substring match (F1).

    Reference escapes the needle and uses ``$regex`` with the ``i`` option
    (``crud_documents.py:40``, ``crud_logs.py:57``); ``lower().contains``
    keeps the predicate pushdown-eligible and regex-injection-safe.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).contains(needle.lower())


def iregex(col: Column | str, pattern: str) -> Column:
    """Case-insensitive regex with the needle escaped — exact reference
    semantics when the caller wants regex (``re.escape`` + ``$options: i``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("(?i)" + re.escape(pattern))


def point_lookup(df: DataFrame, key_col: str, key: object) -> DataFrame:
    """P3: single-row lookup.  Canonical string ids remove the reference's
    UUID/string dual-type retry (``crud_documents.py:135-159``)."""
    return df.filter(F.col(key_col) == F.lit(key))


def batch_lookup(df: DataFrame, key_col: str, keys: list[object]) -> DataFrame:
    """P4: id IN-list lookup (``crud_documents.py:319-357``).  For small id
    lists ``isin`` compiles to an In predicate pushed to the scan; for large
    lists join against a broadcast ids DataFrame instead."""
    return df.filter(F.col(key_col).isin(keys))


def clean_projection_paths(paths: list[str]) -> list[str]:
    """P6: drop a parent path when any strict child path is requested, so
    ``["metadata", "metadata.tags"]`` → ``["metadata.tags"]``.

    Pure plan-construction helper, mirroring reference
    ``services/qa/utils/mongodb_utils.py:9-44``.
    """
    keep: list[str] = []
    for p in paths:
        if any(q != p and q.startswith(p + ".") for q in paths):
            continue
        if p not in keep:
            keep.append(p)
    return keep


def project_paths(df: DataFrame, paths: list[str]) -> DataFrame:
    """P5: nested-path include projection.  Catalyst prunes the parquet
    ``ReadSchema`` down to exactly these (possibly nested) fields."""
    cleaned = clean_projection_paths(paths)
    return df.select(
        *[F.col(p).alias(p.replace(".", "_")) for p in cleaned]
    )


def slice_last_n(col: Column | str, n: int) -> Column:
    """P7: last-N array slice — the reference's ``$slice: -limit`` on
    conversation messages (``crud_conversations.py:199-201``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.size(c) <= n, c).otherwise(
        F.slice(c, F.size(c) - n + 1, n)
    )
