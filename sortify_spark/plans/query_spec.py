"""AI-generated detail-query compilation (SURVEY.md P8) and dynamic
schema discovery (§1.5).

The reference lets an LLM emit ``{projection, sub_filter}`` Mongo specs
which it merges with the target id and runs as ``find_one``
(``document_detail_query_handler.py:306-349``).  Here the spec is a typed
dataclass (the LLM stage is a pluggable producer of it) and compilation
targets the DataFrame API — the engine's IR — with the same safety
rails: projection path-collision cleanup (P6), mandatory tenant
predicate (P9), and a validated operator set.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sortify_spark.operators.filters import clean_projection_paths

#: Operators the spec may use — the validated surface of the reference's
#: Mongo sub_filters ($eq/$ne/$gt/$gte/$lt/$lte/$in/contains).
_OPS = {
    "eq": lambda c, v: c == F.lit(v),
    "ne": lambda c, v: c != F.lit(v),
    "gt": lambda c, v: c > F.lit(v),
    "gte": lambda c, v: c >= F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "lte": lambda c, v: c <= F.lit(v),
    "in": lambda c, v: c.isin(list(v)),
    "contains": lambda c, v: F.lower(c).contains(str(v).lower()),
}


class QuerySpecError(ValueError):
    pass


@dataclass
class QuerySpec:
    """Declarative detail-query: conjunctive filters + include-projection +
    optional limit.  ``filters`` entries are (column_path, op, value)."""

    filters: list[tuple[str, str, object]] = field(default_factory=list)
    projection: list[str] = field(default_factory=list)
    limit: int | None = None

    @classmethod
    def from_json(cls, payload: str) -> "QuerySpec":
        """Parse an externally-produced (LLM) spec with validation — the
        untrusted boundary."""
        raw = json.loads(payload)
        filters = [
            (str(f["col"]), str(f["op"]), f["value"])
            for f in raw.get("filters", [])
        ]
        return cls(
            filters=filters,
            projection=[str(p) for p in raw.get("projection", [])],
            limit=raw.get("limit"),
        )

    def predicate(self) -> Column:
        out = F.lit(True)
        for col_path, op, value in self.filters:
            if op not in _OPS:
                raise QuerySpecError(
                    f"operator {op!r} not allowed; one of {sorted(_OPS)}"
                )
            out = out & _OPS[op](F.col(col_path), value)
        return out


def compile_spec(
    df: DataFrame,
    spec: QuerySpec,
    owner_id: str | None = None,
    owner_col: str = "owner_id",
) -> DataFrame:
    """Compile the spec onto a documents DataFrame.  The tenant predicate
    is injected unconditionally when ``owner_id`` is given (P9) — a spec
    can never widen access."""
    out = df.filter(spec.predicate())
    if owner_id is not None:
        out = out.filter(F.col(owner_col) == F.lit(owner_id))
    if spec.projection:
        paths = clean_projection_paths(spec.projection)
        out = out.select(
            *[F.col(p).alias(p.replace(".", "_")) for p in paths]
        )
    if spec.limit:
        out = out.limit(spec.limit)
    return out


def discover_dynamic_schema(
    df: DataFrame, json_col: str, sample_n: int = 5
) -> dict[str, str]:
    """§1.5 schema-on-read discovery: sample N rows of a JSON column and
    union their key→type maps — the engine's version of the reference
    walking ``dynamic_fields`` of ≤5 sampled documents
    (``document_detail_query_handler.py:189-258``).

    Bounded driver-side sample by design (the reference samples 5); the
    result feeds spec generation, not execution.
    """
    rows = (
        df.select(json_col).filter(F.col(json_col).isNotNull()).limit(sample_n).collect()
    )
    schema: dict[str, str] = {}

    def walk(prefix: str, obj: object) -> None:
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        else:
            tname = type(obj).__name__
            prev = schema.get(prefix)
            schema[prefix] = tname if prev in (None, tname) else "mixed"

    for row in rows:
        try:
            walk("", json.loads(row[json_col]))
        except (TypeError, ValueError):
            continue
    return schema
