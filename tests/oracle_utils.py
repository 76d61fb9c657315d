"""Local rehearsal of the driver's correctness gate: run the Spark plan and
the DuckDB oracle side by side, compare row count, column names, and exact
values order-insensitively."""

from __future__ import annotations

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def assert_parity(spark_df, duck_con, sql: str, name: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            g = g.astype("float64")
            w = w.astype("float64")
            bad = ~((g == w) | (g.isna() & w.isna()))
        else:
            bad = ~((g.astype(object) == w.astype(object)) | (g.isna() & w.isna()))
        assert not bad.any(), (
            f"{name}: value mismatch in column {col!r}, first few:\n"
            f"spark={g[bad].head(5).tolist()}\n"
            f"duck ={w[bad].head(5).tolist()}"
        )
