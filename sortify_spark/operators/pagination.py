"""Sort allowlist + skip/limit pagination (SURVEY.md §2.6, O1-O3, A11).

Reference: sort allowlist ``crud_documents.py:210-216``, ``.skip().limit()``
pagination everywhere (``crud_documents.py:218``).  Two scale-minded
differences from a naive translation:

* Every page order gets a unique-key tie-breaker so pagination is
  deterministic across engines/partitionings (the reference inherits
  Mongo's stable-but-unspecified order; Spark has none without one).
* ``page_with_total`` reuses ONE filtered DataFrame for both the page and
  the total count — the reference issues two independent queries
  (``crud_documents.py:269-277``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SortSpecError(ValueError):
    pass


def validated_order(
    sort_by: str,
    sort_order: str,
    allowlist: tuple[str, ...],
    tiebreak_col: str,
) -> list[Column]:
    """O1: reject unknown sort columns/directions, append the tie-breaker."""
    if sort_by not in allowlist:
        raise SortSpecError(f"sort_by must be one of {allowlist}, got {sort_by!r}")
    if sort_order not in ("asc", "desc"):
        raise SortSpecError(f"sort_order must be asc|desc, got {sort_order!r}")
    key = F.col(sort_by).asc() if sort_order == "asc" else F.col(sort_by).desc()
    return [key, F.col(tiebreak_col).asc()]


def paginate(
    df: DataFrame,
    order: list[Column],
    skip: int = 0,
    limit: int = 100,
    max_limit: int = 100,
) -> DataFrame:
    """O2: ordered offset/limit page.  ``limit`` is capped like the
    reference's API guard (≤100, ``apis/v1/documents.py:229``).

    Physical note: global sort + offset+limit compiles to a
    TakeOrderedAndProject when (skip+limit) is small — no full sort at
    scale.
    """
    limit = min(limit, max_limit)
    page = df.orderBy(*order)
    if skip:
        page = page.offset(skip)
    return page.limit(limit)


def page_with_total(
    df: DataFrame,
    predicate: Column,
    order: list[Column],
    skip: int = 0,
    limit: int = 100,
) -> tuple[DataFrame, DataFrame]:
    """A11: (page, total-count) from one shared filtered plan."""
    filtered = df.filter(predicate)
    return paginate(filtered, order, skip, limit), filtered.agg(
        F.count(F.lit(1)).alias("total")
    )
