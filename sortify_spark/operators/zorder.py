"""Z-order (Morton) data layout for multi-dimensional data skipping.

Motivation at 100 TB: a corpus laid out by ONE column (date, owner)
prunes beautifully on that column and not at all on any other.  Range
queries over two dimensions — e.g. ``user_id BETWEEN a AND b AND ts
BETWEEN t1 AND t2`` over the events table — read everything under a
single-column sort.  Interleaving the bits of both dimensions into one
Morton key and range-partitioning + sorting by it makes every output
file cover a small *rectangle* of the (x, y) grid, so the parquet
footer min/max statistics on BOTH original columns become tight and
row-group/file pruning works for predicates on either dimension (this
is exactly Delta Lake's ``OPTIMIZE ZORDER BY`` layout, re-expressed
with stock ``repartitionByRange`` + ``sortWithinPartitions``).

Everything here is pure Catalyst arithmetic (shifts, masks, ORs —
whole-stage-codegen friendly, no UDF), and the bit-spread formula is
replayable verbatim in DuckDB with ``<<``/``&``/``|``, so the z-value
computation itself is oracle-checkable (``zorder_cells`` in
``queries_extras``).

Reference anchor: the reference stores documents in Mongo with B-tree
indexes per queried column (``backend/app/models``); a columnar lake
has no secondary indexes, so *layout* is the index — this module is
the Spark-native equivalent for the reference's two-column listing
filters (owner + date, ``crud_documents.py`` filter builders).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) pairs that spread a 16-bit int so its bits occupy the
#: even positions of a 32-bit lane (classic Morton magic numbers).
_SPREAD_16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions (bit i →
    bit 2i) with the shift-and-mask ladder — 8 codegen ops, no UDF.

    Input must be in [0, 65535]; computed in BIGINT so the result
    (< 2^31) never touches the sign bit.
    """
    x = col.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_16:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def spread_bits16_sql(expr: str) -> str:
    """DuckDB twin of :func:`spread_bits16` — identical ladder, for
    oracle SQL composition."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_16:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zvalue(x: Column, y: Column) -> Column:
    """Morton key of two 16-bit grid coordinates: interleave so ``x``
    takes even bits and ``y`` odd bits.  Monotone in the Z-curve order;
    nearby (x, y) cells get nearby keys."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def zvalue_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB twin of :func:`zvalue`."""
    return (
        f"({spread_bits16_sql(x_expr)} | "
        f"({spread_bits16_sql(y_expr)} << 1))"
    )


def grid_coord(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits - 1] given
    known bounds (clamped).  Bounds are parameters, not a hidden
    ``collect`` — at scale they come from table statistics or a prior
    one-row aggregate, and KEEPING them explicit makes the layout
    deterministic and replayable."""
    cells = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit((float(hi) - float(lo)) or 1.0)
        * F.lit(float(cells + 1))
    ).cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit(cells), scaled))


def grid_coord_sql(expr: str, lo: float, hi: float, bits: int = 16) -> str:
    """DuckDB twin of :func:`grid_coord`."""
    cells = (1 << bits) - 1
    span = (float(hi) - float(lo)) or 1.0
    scaled = (
        f"CAST(FLOOR((CAST({expr} AS DOUBLE) - {float(lo)!r}) / {span!r} "
        f"* {float(cells + 1)!r}) AS BIGINT)"
    )
    return f"GREATEST(0, LEAST({cells}, {scaled}))"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files z-ordered on two
    columns.  ``cols`` is ``[(name, lo, hi), (name, lo, hi)]``.

    ``repartitionByRange`` on the Morton key gives each output file a
    contiguous key range (one range-shuffle — same cost class as any
    global sort layout job); ``sortWithinPartitions`` tightens per
    row-group statistics inside each file.  The key column is dropped
    before writing: the LAYOUT is the artifact, readers filter on the
    original columns and rely on footer min/max pruning.
    """
    (xn, xl, xh), (yn, yl, yh) = cols
    z = zvalue(
        grid_coord(F.col(xn), xl, xh, bits),
        grid_coord(F.col(yn), yl, yh, bits),
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
