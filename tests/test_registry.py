"""Driver-window discipline as a TEST (VERDICT r10 #6): the import-time
guard in ``all_queries`` already fails hard, but a named test makes the
property visible in every round's suite run and extends it to the
rows-only entries the import guard cannot cover."""

from __future__ import annotations

import pytest

import os

from sortify_spark.all_queries import PRIORITY, REGISTRY
from sortify_spark.queries_suites import SUITE_MEMBERS
from tests.conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_reachability():
    """Every ORACLE-BACKED query is reachable from a driver-verified
    row: in the 50-slot window itself, a member of an in-window suite,
    or on the frozen round-3 grandfather list of redundant twins (which
    must never grow — a new oracle-backed query earns a suite fold)."""
    from sortify_spark.all_queries import _WINDOW_LOCAL_ONLY

    assert len(PRIORITY) == 50
    assert all(REGISTRY[n].sql is not None for n in PRIORITY)
    reachable = set(PRIORITY)
    for s in PRIORITY:
        reachable |= set(SUITE_MEMBERS.get(s, ()))
    unreachable = [
        n
        for n, qd in REGISTRY.items()
        if qd.sql is not None
        and n not in reachable
        and n not in _WINDOW_LOCAL_ONLY
    ]
    assert not unreachable, unreachable
    # the grandfather list is frozen: everything on it must still exist
    # and still be oracle-backed (DuckDB-verified by test_oracle_parity)
    for n in _WINDOW_LOCAL_ONLY:
        assert n in REGISTRY and REGISTRY[n].sql is not None, n


@pytest.mark.slow
def test_rows_only_queries_execute(spark):
    """Rows-only registry entries (no oracle by nature) cannot earn a
    hash-checked driver row — run EVERY one not already covered by
    bench.py's HEADLINE at sf0.001 and assert it produces a stable
    schema and materializes (the driver's own rows-only contract).
    This is execution, not a name grep: a rows-only query that breaks
    fails the round here."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", f"{REPO}/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rows_only = [n for n, qd in REGISTRY.items() if qd.sql is None]
    assert rows_only, "registry unexpectedly has no rows-only entries"
    uncovered = [n for n in rows_only if n not in bench.HEADLINE]
    assert uncovered, "expected some rows-only queries outside HEADLINE"
    for name in uncovered:
        df = REGISTRY[name].fn(spark, SF_DIR)
        assert df.columns, name
        assert len(df.collect()) >= 0, name
