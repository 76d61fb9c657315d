"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from sortify_spark.all_queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_parity

#: Heavy parity cases (≥10 s each in the r14 full-suite timing run,
#: dominated by the multi-query suite rows and lifecycle replays) are
#: marked ``slow`` so the driver's default `pytest tests/ -x -q` run
#: finishes inside its verify budget (VERDICT r13 next #1).  They stay
#: green and runnable via ``pytest -m ""`` / ``-m slow``; the driver's
#: own CORRECTNESS gate independently re-checks every oracle query at
#: sf0.01 regardless of pytest markers.
SLOW_CASES = {
    "admission_replay",
    "bm25_index_probe",
    "bpe_token_stats",
    "cluster_per_owner_dbscan",
    "knn_ivf_floored",
    "streaming_sessions",
    "suite_ann_dense",
    "suite_cluster_metrics",
    "suite_curation_dedup",
    "suite_curation_quality",
    "suite_group_aggs",
    "suite_index_lifecycle",
    "suite_relational",
    "suite_scalar_aggs",
    "suite_streaming",
    "vectorize_replay",
}

CASES = [
    pytest.param(name, marks=pytest.mark.slow)
    if name in SLOW_CASES
    else name
    for name, qd in REGISTRY.items()
    if qd.sql is not None
]


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    assert_parity(qd.fn(spark, SF_DIR), duck, qd.sql, name)


def test_rows_only_queries_run(spark):
    for name, qd in REGISTRY.items():
        if qd.sql is None:
            assert qd.fn(spark, SF_DIR).count() >= 0, name
