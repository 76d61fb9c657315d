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

#: Scalar operators the spec may use — the validated surface of the
#: reference's Mongo sub_filters ($eq/$ne/$gt/$gte/$lt/$lte/$in/
#: contains).  The composite shapes its LLM query generator also emits
#: ($exists, $regex, $or, $elemMatch — crud_documents.py:40-56,
#: document_detail_query_handler.py:306-349) compile in
#: :meth:`QuerySpec.predicate` below.
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

#: Bounded $or: the reference's generator emits small disjunction lists
#: (the pending-status shape has 3 branches); an unbounded one is a
#: prompt-injection amplifier, so refuse loudly past this.
_MAX_OR_BRANCHES = 8


class QuerySpecError(ValueError):
    pass


def _offline_java_regex_check(pattern: str, col_path: str) -> None:
    """Conservative Python-vs-Java regex subset check that needs NO
    JVM: reject constructs that ``re.compile`` accepts but
    ``java.util.regex`` (what ``rlike`` executes) does not, so a
    session-less ``compile_spec`` can never pass a pattern that later
    fails on an executor (VERDICT r7 item 7).  Rejected:

    * ``(?P<name>…)`` / ``(?P=name)`` — Python-only named-group syntax
      (Java spells it ``(?<name>…)``);
    * ``(?(id)yes|no)`` conditional groups — Python-only;
    * a bare ``{`` outside a character class that does not start a
      valid ``{m}`` / ``{m,}`` / ``{m,n}`` quantifier — a literal in
      Python, ``PatternSyntaxException: Illegal repetition`` in Java.

    Conservative by design: it may reject an exotic pattern a JVM
    would accept (escape the brace / use Java named-group syntax), but
    it never passes a known-incompatible one.  The live-session JVM
    ``Pattern.compile`` check remains the full validator."""
    import re as _re

    for marker, what in (("(?P", "named-group syntax (?P"),
                         ("(?(", "conditional group (?(")):
        if marker in pattern:
            raise QuerySpecError(
                f"regex for {col_path!r} uses Python-only {what}...) "
                "which Java regex (rlike executes JVM-side) rejects"
            )
    i, n, in_class = 0, len(pattern), False
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "{" and not _re.match(
            r"\{\d+(,\d*)?\}", pattern[i:]
        ):
            raise QuerySpecError(
                f"regex for {col_path!r} has a bare '{{' that is not a "
                "{m}/{m,}/{m,n} quantifier — a literal in Python but "
                "'Illegal repetition' in Java regex; escape it as "
                r"'\{'"
            )
        i += 1


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
            out = out & _compile_filter(col_path, op, value)
        return out


def _compile_filter(
    col_path: str, op: str, value: object, depth: int = 0
) -> Column:
    """One (col, op, value) triple → a Column predicate.  Beyond the
    scalar ``_OPS``, the reference's Mongo query surface adds:

    * ``exists`` — ``$exists``: value True/False; in the columnar store
      a dynamic field that was never written is NULL, so this is the
      null test (``crud_documents.py:53``'s pending shape).
    * ``regex`` — ``$regex``: value is a pattern string, or
      ``{"pattern": p, "options": "i"}`` for the case-insensitive form
      the reference emits (``crud_documents.py:40``).  The pattern is
      validated with ``re.compile`` at COMPILE time, so a malformed
      LLM-produced pattern fails loudly here, not mid-job on an
      executor.
    * ``or`` — ``$or``: value is a bounded list of sub-filter dicts
      (``{"col", "op", "value"}``); nesting another ``or`` inside is
      refused (depth 1, like the reference's generated shapes).
    * ``elem_match`` — ``$elemMatch`` over an array-of-struct column:
      value maps element fields to ``{"op", "value"}`` conditions; the
      predicate holds when ANY element satisfies ALL conditions
      (Mongo's contract), compiled to ``F.exists`` — no explode, no
      shuffle.
    """
    if op == "exists":
        c = F.col(col_path)
        return c.isNotNull() if value else c.isNull()
    if op == "regex":
        import re

        if isinstance(value, dict):
            pattern = str(value.get("pattern", ""))
            options = str(value.get("options", ""))
        else:
            pattern, options = str(value), ""
        try:
            re.compile(pattern)
        except re.error as exc:
            raise QuerySpecError(
                f"invalid regex for {col_path!r}: {exc}"
            ) from None
        if "i" in options:
            pattern = f"(?i){pattern}"
        # rlike executes with JAVA regex semantics; a Python-valid but
        # Java-invalid pattern (e.g. ``(?P<name>x)``) would otherwise
        # fail mid-job on an executor.  First an OFFLINE conservative
        # subset check (always runs — a session-less validation must
        # not pass a pattern that later dies on an executor, VERDICT
        # r7 item 7), then the JVM's own Pattern.compile when a
        # session is live (ADVICE r6).
        _offline_java_regex_check(pattern, col_path)
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        if sess is not None:
            try:
                sess._jvm.java.util.regex.Pattern.compile(pattern)
            except Exception as exc:  # Py4J wraps PatternSyntaxException
                msg = str(getattr(exc, "java_exception", exc))
                raise QuerySpecError(
                    f"regex for {col_path!r} is not valid Java regex "
                    f"(rlike executes JVM-side): {msg.splitlines()[0]}"
                ) from None
        return F.col(col_path).rlike(pattern)
    if op == "or":
        if depth > 0:
            raise QuerySpecError("nested 'or' filters are not allowed")
        if not isinstance(value, (list, tuple)) or not value:
            raise QuerySpecError("'or' takes a non-empty list of filters")
        if len(value) > _MAX_OR_BRANCHES:
            raise QuerySpecError(
                f"'or' exceeds {_MAX_OR_BRANCHES} branches"
            )
        out = F.lit(False)
        for sub in value:
            # validate sub-filter shape loudly — the spec is untrusted
            # LLM JSON, so a non-dict element or a missing key must be
            # a QuerySpecError, not a KeyError/TypeError (ADVICE r6)
            if not isinstance(sub, dict):
                raise QuerySpecError(
                    "'or' sub-filter must be a dict with 'col' and "
                    f"'op'; got {type(sub).__name__}"
                )
            if "col" not in sub or "op" not in sub:
                raise QuerySpecError(
                    "'or' sub-filter missing required key(s) "
                    f"{sorted({'col', 'op'} - set(sub))}"
                )
            out = out | _compile_filter(
                str(sub["col"]), str(sub["op"]), sub.get("value"),
                depth=depth + 1,
            )
        return out
    if op == "elem_match":
        if not isinstance(value, dict) or not value:
            raise QuerySpecError(
                "'elem_match' takes {field: {op, value}} conditions"
            )

        def elem_pred(x: Column) -> Column:
            cond = F.lit(True)
            for fname, spec in value.items():
                if isinstance(spec, dict):
                    sub_op = str(spec.get("op", "eq"))
                    sub_val = spec.get("value")
                else:  # bare value = eq shorthand (Mongo's implicit form)
                    sub_op, sub_val = "eq", spec
                if sub_op not in _OPS:
                    raise QuerySpecError(
                        f"elem_match operator {sub_op!r} not allowed; "
                        f"one of {sorted(_OPS)}"
                    )
                cond = cond & _OPS[sub_op](x[str(fname)], sub_val)
            return cond

        return F.exists(F.col(col_path), elem_pred)
    if op not in _OPS:
        raise QuerySpecError(
            f"operator {op!r} not allowed; one of "
            f"{sorted(_OPS) + ['exists', 'regex', 'or', 'elem_match']}"
        )
    return _OPS[op](F.col(col_path), value)


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


def discover_document_schema(
    df: DataFrame, json_col: str, sample_n: int = 5
) -> tuple[dict[str, str], dict[str, list[str]]]:
    """Reference-parity document-schema discovery
    (``document_detail_query_handler.py:189-258``): sample ≤``sample_n``
    rows of a document-JSON column and walk the nested
    ``analysis.ai_analysis_output.key_information`` subtree (depth 4+):

    * ``dynamic_fields``: each field → key ``dynamic_fields.{name}``
      labeled ``"{name} ({python type name})"`` — FIRST-SEEN-WINS
      across the sample (the reference's ``if field_key not in
      actual_schema_fields``; per-doc type conflicts do NOT merge to a
      'mixed' marker — the first sampled doc's type stands);
    * ``structured_entities``: each entity type → key
      ``structured_entities.{type}`` labeled ``"{type} entity"``;
    * per-document field provenance: ``{filename: [field_keys]}`` (the
      reference's ``schema_by_document``), so callers can log which doc
      contributed which fields.

    Returns ``(merged_schema, schema_by_document)``.  Bounded
    driver-side sample by design (the reference samples 5); the result
    feeds spec generation, not execution."""
    rows = (
        df.select(json_col)
        .filter(F.col(json_col).isNotNull())
        .limit(sample_n)
        .collect()
    )
    schema: dict[str, str] = {}
    by_doc: dict[str, list[str]] = {}
    for row in rows:
        try:
            doc = json.loads(row[json_col])
        except (TypeError, ValueError):
            continue
        if not isinstance(doc, dict):
            # a JSON array/scalar top level is tolerated the same way
            # unparseable JSON is: skip the doc, not the whole sample
            continue
        filename = doc.get("filename", "unknown")
        # real document JSON carries explicit nulls and occasional
        # non-object values on these keys — anything that is not an
        # object reads as absent rather than crashing the whole sample
        key_info: object = doc
        for step in ("analysis", "ai_analysis_output", "key_information"):
            key_info = (
                key_info.get(step) if isinstance(key_info, dict) else None
            )
        if not isinstance(key_info, dict):
            key_info = {}
        doc_fields: list[str] = []
        dyn = key_info.get("dynamic_fields")
        if isinstance(dyn, dict):
            for name, value in dyn.items():
                key = f"dynamic_fields.{name}"
                if key not in schema:
                    schema[key] = f"{name} ({type(value).__name__})"
                doc_fields.append(key)
        ents = key_info.get("structured_entities")
        if isinstance(ents, dict):
            for etype in ents.keys():
                key = f"structured_entities.{etype}"
                if key not in schema:
                    schema[key] = f"{etype} entity"
                doc_fields.append(key)
        if doc_fields:
            by_doc[filename] = doc_fields
    return schema, by_doc


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
