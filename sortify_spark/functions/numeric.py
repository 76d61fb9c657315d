"""Numeric conventions for oracle-exact aggregation.

Double-precision SUM over a big table is order-dependent (different
partitionings accumulate different rounding error), so a Spark sum and a
DuckDB sum of the same column can differ by > 1e-2 at 600 k rows.  The
engine therefore accumulates money-like measures in DECIMAL (exact,
associative, order-independent) and only converts the final scalar to
double.  This also reflects what a production engine should do at 100 TB:
decimal aggregation is exact at any scale and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Per-row cast target.  38 total digits leaves ~28 integral digits of
#: headroom above the 10 fractional ones — no overflow until ~1e28.
_DEC = "decimal(38,10)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: accumulate exact decimal, emit rounded double.

    Equivalent oracle SQL: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(38,10))) AS
    DOUBLE), scale)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)).cast("double"), scale)


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG via exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        (F.sum(c.cast(_DEC)).cast("double") / F.count(c)), scale
    )


def dsum_expr(sql_expr: str, scale: int = 2) -> Column:
    """dsum over a SQL expression string (e.g. a per-row product).

    Per-row double arithmetic is IEEE-deterministic, so computing the
    product in double and casting the row result to decimal matches the
    oracle doing the same.
    """
    return F.round(
        F.sum(F.expr(sql_expr).cast(_DEC)).cast("double"), scale
    )


def oracle_dsum(sql_expr: str, scale: int = 2) -> str:
    """DuckDB-side rendering of :func:`dsum`/:func:`dsum_expr`."""
    return (
        f"ROUND(CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,10))) AS DOUBLE), {scale})"
    )


def oracle_davg(sql_expr: str, scale: int = 4) -> str:
    """DuckDB-side rendering of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,10))) AS DOUBLE)"
        f" / COUNT({sql_expr}), {scale})"
    )
