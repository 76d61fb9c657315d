"""Set operators (SURVEY.md §2.7, SO1-SO4) and the join idioms (§2.3).

The reference performs joins procedurally (fetch ids, then fetch rows);
here they are declared so Catalyst picks broadcast-hash for the small
sides (J1/J2 candidate lists are ≤ tens of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_sources(a: DataFrame, b: DataFrame) -> DataFrame:
    """SO1: union of result branches by column name
    (``enhanced_search_service.py:422``)."""
    return a.unionByName(b, allowMissingColumns=True)


def semi_join_ids(
    df: DataFrame, ids: DataFrame, key: str, broadcast_ids: bool = True
) -> DataFrame:
    """J1/J4: restrict a scan to a candidate id set — the reference pushes
    ``document_id $in candidates`` into the Chroma query
    (``enhanced_search_service.py:170-179``).  Broadcast left-semi join ⇒
    no shuffle of the big side."""
    right = F.broadcast(ids) if broadcast_ids else ids
    return df.join(right, on=key, how="left_semi")


def anti_join_ids(df: DataFrame, ids: DataFrame, key: str) -> DataFrame:
    """SO4: difference (`dropped = selected − validated`,
    ``qa_document_processor.py:107-113``)."""
    return df.join(F.broadcast(ids), on=key, how="left_anti")


def hydrate(
    results: DataFrame, dim: DataFrame, key: str, broadcast_results: bool = True
) -> DataFrame:
    """J2: hydrate search-result ids with full rows
    (``document_detail_query_handler.py:295`` + ``crud_documents.py:319-357``).

    The *results* side is the small one (top-k ids), so broadcast it and
    stream the big table past it — at 100 TB the dimension is the big side.
    """
    left = F.broadcast(results) if broadcast_results else results
    return left.join(dim, on=key, how="inner")
