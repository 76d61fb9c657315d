"""Z-order layout (operators/zorder.py): the Morton-key arithmetic must
match a bit-at-a-time reference, and the written layout must actually
enable multi-dimensional row-group skipping — asserted deterministically
from parquet footer statistics, not from flaky scan metrics."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sortify_spark.operators.zorder import (
    grid_coord,
    spread_bits16,
    write_zordered,
    zvalue,
)


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
           (255, 256), (40000, 3)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): (r["z"], r["sx"])
        for r in df.select(
            "x",
            "y",
            zvalue(F.col("x"), F.col("y")).alias("z"),
            spread_bits16(F.col("x")).alias("sx"),
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)][0] == _morton_ref(x, y), (x, y)
        assert got[(x, y)][1] == _morton_ref(x, 0), (x, y)


def _rowgroup_stats(path: str, xcol: str, ycol: str):
    """Per-row-group (min, max) of both columns across all files."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i
                 for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            sx = g.column(names[xcol]).statistics
            sy = g.column(names[ycol]).statistics
            out.append(((sx.min, sx.max), (sy.min, sy.max)))
    return out


def _skippable(stats, lo, hi, dim):
    """Row groups a reader can prune for ``dim BETWEEN lo AND hi``."""
    return sum(1 for s in stats if s[dim][0] > hi or s[dim][1] < lo)


def test_zorder_layout_prunes_both_dimensions(spark):
    n, side = 40000, 200  # uniform 200x200 grid, one row per cell
    df = spark.range(n).select(
        (F.col("id") % side).cast("int").alias("x"),
        (F.col("id") / side).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        zpath, xpath = f"{tmp}/zorder", f"{tmp}/xsort"
        write_zordered(
            df, zpath, [("x", 0, side), ("y", 0, side)], n_files=16
        )
        # baseline: classic single-column sort layout, same file count
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(xpath)
        )
        zstats = _rowgroup_stats(zpath, "x", "y")
        xstats = _rowgroup_stats(xpath, "x", "y")
        assert len(zstats) >= 16 and len(xstats) >= 16

        # a y-only band predicate: x-sorted layout cannot prune (every
        # file spans all y); z-order prunes most row groups
        y_lo, y_hi = 40, 59
        assert _skippable(xstats, y_lo, y_hi, dim=1) == 0
        z_frac = _skippable(zstats, y_lo, y_hi, dim=1) / len(zstats)
        assert z_frac >= 0.5, f"z-order pruned only {z_frac:.0%} on y-band"

        # a box predicate (10% of each side → 1% of the data): z-order
        # row groups are rectangles, so pruning on EITHER dim applies
        bx = (20, 39)
        by = (120, 139)
        z_pruned = sum(
            1
            for s in zstats
            if s[0][0] > bx[1] or s[0][1] < bx[0]
            or s[1][0] > by[1] or s[1][1] < by[0]
        )
        assert z_pruned / len(zstats) >= 0.75, "box pruning too weak"

        # correctness: the layout is only a reordering
        back = spark.read.parquet(zpath)
        assert back.count() == n
        got = back.filter(
            (F.col("x").between(*bx)) & (F.col("y").between(*by))
        ).count()
        assert got == 20 * 20


def test_grid_coord_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (511.5,), (1024.0,), (2000.0,)], "v double"
    )
    vals = [
        r["g"]
        for r in df.select(
            grid_coord(F.col("v"), 0, 1024).alias("g")
        ).collect()
    ]
    assert vals[0] == 0  # clamped low
    assert vals[1] == 0
    assert vals[2] == int(511.5 / 1024 * 65536)
    assert vals[3] == 65535  # exact hi clamps to top cell
    assert vals[4] == 65535  # clamped high
