"""Multi-format document ingestion (source-format breadth next to the
parquet tables and the binaryFile extractor path).

The reference ingests uploads and Gmail messages only; a training-data
pipeline additionally receives corpora as CSV / JSONL / parquet drops.
One reader maps any of them onto the canonical corpus schema with
explicit schema enforcement — no ``inferSchema`` scans (an extra full
pass over 100 TB) and no silently drifting column types.

Quarantine semantics: delimited formats parse line-by-line with
``from_json`` / ``from_csv`` (a narrow map over a text scan — one pass,
no shuffle); a line that fails to parse lands with its raw content in
``ingest_error`` and NULL fields instead of failing the job, mirroring
the extractor path's per-row error capture.  (The DataSource readers'
``_corrupt_record`` column is deliberately avoided: Spark rejects
corrupt-only projections over it, which makes audit queries brittle.)
CSV is parsed line-wise, so embedded newlines inside quoted fields are
out of scope — standard for machine-generated corpus drops; use parquet
for free-form text with newlines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical ingest-side corpus schema (tables.DOCUMENTS_SCHEMA is the
#: richer engine table; this is the minimal corpus-drop contract).
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


#: Corrupt-record capture field for the line parsers (the *expression*
#: forms of from_json/from_csv don't share the DataSource readers'
#: corrupt-only-projection restriction).
_CR = "__corrupt"
_PARSE_SCHEMA = T.StructType(
    [*CORPUS_SCHEMA.fields, T.StructField(_CR, T.StringType())]
)
_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CR}


def _finish(lines: DataFrame, parsed_col) -> DataFrame:
    """(value, parsed struct) → good rows ∪ quarantined rows."""
    with_parsed = lines.select(F.col("value"), parsed_col.alias("__p"))
    bad = F.col("__p").isNull() | F.col(f"__p.{_CR}").isNotNull()
    return with_parsed.select(
        *[
            F.when(~bad, F.col(f"__p.{f.name}")).alias(f.name)
            for f in CORPUS_SCHEMA.fields
        ],
        F.when(bad, F.col("value")).alias("ingest_error"),
    )


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    csv_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a corpus drop in ``fmt`` ∈ {parquet, csv, jsonl} onto
    CORPUS_SCHEMA (+ ``ingest_error``), quarantining malformed records
    per row so ingest keeps flowing and bad lines stay auditable."""
    fmt = fmt.lower()
    if fmt == "parquet":
        df = spark.read.parquet(path)
        missing = [
            f.name for f in CORPUS_SCHEMA.fields if f.name not in df.columns
        ]
        if missing:
            raise ValueError(f"corpus parquet missing columns: {missing}")
        return df.select(
            *[F.col(f.name).cast(f.dataType) for f in CORPUS_SCHEMA.fields]
        ).withColumn("ingest_error", F.lit(None).cast("string"))
    if fmt == "jsonl":
        lines = spark.read.text(path)
        return _finish(
            lines, F.from_json(F.col("value"), _PARSE_SCHEMA, _PARSE_OPTS)
        )
    if fmt == "csv":
        opts = {"escape": '"', **(csv_options or {}), **_PARSE_OPTS}
        lines = spark.read.text(path)
        # Per-file headers repeat; drop every line that is the header row.
        first_col = CORPUS_SCHEMA.fields[0].name
        lines = lines.filter(
            ~F.col("value").rlike(rf'^"?{first_col}"?[,;]')
        ).filter(F.length(F.trim(F.col("value"))) > 0)
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in _PARSE_SCHEMA.fields
        )
        return _finish(lines, F.from_csv(F.col("value"), ddl, opts))
    raise ValueError(f"unsupported corpus format {fmt!r}")
