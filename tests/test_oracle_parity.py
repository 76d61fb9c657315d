"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from sortify_spark.all_queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_parity

CASES = [name for name, qd in REGISTRY.items() if qd.sql is not None]


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    assert_parity(qd.fn(spark, SF_DIR), duck, qd.sql, name)


def test_rows_only_queries_run(spark):
    for name, qd in REGISTRY.items():
        if qd.sql is None:
            assert qd.fn(spark, SF_DIR).count() >= 0, name
