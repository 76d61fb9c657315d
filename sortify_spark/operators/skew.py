"""Skew mitigation for large joins: key salting.

At 100 TB a sort-merge join on a skewed key (one user owning 1% of all
events, one hot order key) stalls the stage on a single straggler task.
AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting is the plan-level tool for when the skew is
known and extreme — it trades a bounded replication of the small side
for an even shuffle of the big side.

Semantics are identical to a plain equi-join (oracle-checked by the
``salted_join_revenue`` query): the big side scatters each row into one
of ``salt_n`` sub-keys derived deterministically from a second column;
the small side replicates across all ``salt_n`` sub-keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: Column,
    salt_n: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with ``salt_n``-way salting.

    ``salt_from`` must be a deterministic expression over the big side
    (e.g. a line number) so repeated runs shuffle identically; using
    ``rand()`` here would make retries non-reproducible.

    The big side gets the gated tiny-scan fan-out first: when the
    planner broadcasts the small side (AQE does at test scale), the
    join probe + partial aggregate otherwise run entirely inside the
    big side's scan stage — one task for a single-file table.  At
    cluster scale the scan already has many splits and the fan-out is
    an exact no-op (r13 alternating A/B: 2.79 s → 1.77 s median on
    salted_join_revenue at sf0.1).
    """
    from sortify_spark.operators.partitioning import fan_out

    big = fan_out(big)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_from), F.lit(salt_n)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<int>")),
    )
    return salted_big.join(salted_small, [key, "__salt"], how).drop("__salt")
