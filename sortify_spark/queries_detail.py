"""Detail-query compilation (P8), schema discovery (§1.5), rolling-hash
fingerprints, and the streaming daily-trend twin as registered queries.

P8 is the reference's "AI generates a Mongo spec, engine runs it" path
(``document_detail_query_handler.py:306-349``); here the spec compiles to
a DataFrame plan and is oracle-checked like any other relational query.
The streaming entry proves batch/stream parity through the driver's own
correctness gate: the availableNow run must hash-match the batch oracle.
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.functions.numeric import oracle_davg
from sortify_spark.queries import register, _t
from sortify_spark.streaming import await_or_raise

#: Fixed spec standing in for an LLM-produced one (the untrusted-JSON
#: boundary of ``QuerySpec.from_json`` is the same either way).  One
#: predicate of EVERY shape the reference's query generator can emit:
#: scalar ops, $exists, case-insensitive $regex, bounded $or, and
#: $elemMatch over an array-of-struct field (crud_documents.py:40-56).
_DETAIL_SPEC = json.dumps(
    {
        "filters": [
            {"col": "lang", "op": "eq", "value": "en"},
            {"col": "n_chars", "op": "gte", "value": 200},
            {"col": "text", "op": "contains", "value": "data"},
            {"col": "opt", "op": "exists", "value": True},
            {
                "col": "text",
                "op": "regex",
                "value": {"pattern": "dat[a]|join", "options": "i"},
            },
            {
                "col": "$or",
                "op": "or",
                "value": [
                    {"col": "n_chars", "op": "gte", "value": 400},
                    {"col": "n_chars", "op": "lt", "value": 260},
                ],
            },
            {
                "col": "tags",
                "op": "elem_match",
                "value": {
                    "tag": {"op": "contains", "value": "a"},
                    "n": {"op": "gte", "value": 4},
                },
            },
        ],
        "projection": ["doc_id", "lang", "n_chars"],
    }
)


@register(
    "detail_query_compiled",
    """
    WITH d AS (
      SELECT doc_id, text, lang, n_chars,
             CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS opt,
             list_transform(string_split(text, ' ')[1:5],
                 w -> struct_pack(tag := w, n := length(w))) AS tags
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM d
    WHERE lang = 'en' AND n_chars >= 200
      AND lower(text) LIKE '%data%'
      AND opt IS NOT NULL
      AND regexp_matches(text, '(?i)dat[a]|join')
      AND (n_chars >= 400 OR n_chars < 260)
      AND len(list_filter(tags,
              t -> contains(lower(t.tag), 'a') AND t.n >= 4)) > 0
    """,
    note="P8: AI-generated detail-query spec (JSON, validated operator "
    "set) compiled onto the documents DataFrame with projection "
    "path-collision cleanup (P6) — "
    "document_detail_query_handler.py:306-349.  Covers the FULL "
    "reference query surface: scalar ops plus $exists (null test on a "
    "sometimes-null derived column), validated case-insensitive "
    "$regex, bounded $or, and $elemMatch over an array-of-struct "
    "column compiled to F.exists (no explode, no shuffle) — "
    "crud_documents.py:40-56, mongodb_utils.py:9-44.",
)
def q_detail_query_compiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.plans.query_spec import QuerySpec, compile_spec

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        # a sometimes-null dynamic field (the $exists target) and an
        # array-of-struct field (the $elemMatch target), derived
        # deterministically so the oracle replays them
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("source"))
        .alias("opt"),
        F.transform(
            F.slice(F.split(F.col("text"), " "), 1, 5),
            lambda w: F.struct(
                w.alias("tag"), F.length(w).alias("n")
            ),
        ).alias("tags"),
    )
    spec = QuerySpec.from_json(_DETAIL_SPEC)
    return compile_spec(docs, spec)


#: 64-bit-safe polynomial rolling hash: acc = (acc*31 + codepoint) mod p.
_ROLL_P = 1_000_000_007


@register(
    "rolling_fingerprints",
    f"""
    SELECT doc_id,
           list_reduce(
             list_transform(regexp_extract_all(text, '.'),
                            c -> CAST(ord(c) AS BIGINT)),
             (acc, x) -> (acc * 31 + x) % {_ROLL_P}) AS fp
    FROM documents
    WHERE doc_id < 100
    """,
    note="Document fingerprinting via character-level polynomial rolling "
    "hash (training-data curation primitive) — pure Catalyst "
    "higher-order functions, no UDF; the md5 variant backs exact dedup.",
)
def q_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.expr(
                "aggregate(transform(split(text, ''), c -> "
                "cast(ascii(c) as bigint)), 0L, "
                f"(acc, x) -> (acc * 31 + x) % {_ROLL_P}L)"
            ).alias("fp"),
        )
    )


@register(
    "schema_discovery",
    # The events.props payloads are {"k": <int>} by construction; the
    # oracle pins the discovered union schema to that ground truth.
    "SELECT 'k' AS field, 'int' AS dtype",
    note="§1.5 dynamic schema-on-read: sample 5 rows of the events.props "
    "JSON column (deterministic: lowest event_id) and union their "
    "key→type maps — document_detail_query_handler.py:189-258.",
)
def q_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.plans.query_spec import discover_dynamic_schema

    events = _t(spark, sf_dir, "events").orderBy("event_id")
    schema = discover_dynamic_schema(events, "props", sample_n=5)
    return spark.createDataFrame(
        sorted(schema.items()), "field string, dtype string"
    )


#: Crafted per-doc JSON with CONFLICTING dynamic schemas (VERDICT r9 #6):
#: even docs carry {amount: int, vendor: str, meta: dict} + date/amount
#: entities; odd docs carry {amount: str, note: null, score: float} + a
#: people entity.  The merged union must resolve `amount` FIRST-SEEN-WINS
#: (doc 0's int — the reference's `if field_key not in
#: actual_schema_fields`, NOT a 'mixed' marker) and record per-doc field
#: provenance.
_KI = '$.analysis.ai_analysis_output.key_information'
_JTYPE_MAP = (
    "CASE COALESCE(json_type(j, '{path}'), 'NULL') "
    "WHEN 'VARCHAR' THEN 'str' WHEN 'BIGINT' THEN 'int' "
    "WHEN 'UBIGINT' THEN 'int' WHEN 'DOUBLE' THEN 'float' "
    "WHEN 'BOOLEAN' THEN 'bool' WHEN 'OBJECT' THEN 'dict' "
    "WHEN 'ARRAY' THEN 'list' ELSE 'NoneType' END"
)

_SCHEMA_NESTED_SQL = f"""
WITH docs AS (
  SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) AS filename,
    CASE WHEN doc_id % 2 = 0 THEN
      '{{"filename":"doc' || CAST(doc_id AS VARCHAR)
      || '","analysis":{{"ai_analysis_output":{{"key_information":'
      || '{{"dynamic_fields":{{"amount":' || CAST(n_chars AS VARCHAR)
      || ',"vendor":"' || source || '","meta":{{"a":1}}}},'
      || '"structured_entities":{{"dates":["d"],"amounts":[1]}}}}}}}}}}'
    ELSE
      '{{"filename":"doc' || CAST(doc_id AS VARCHAR)
      || '","analysis":{{"ai_analysis_output":{{"key_information":'
      || '{{"dynamic_fields":{{"amount":"' || CAST(n_chars AS VARCHAR)
      || '","note":null,"score":1.5}},'
      || '"structured_entities":{{"people":["p"]}}}}}}}}}}'
    END AS j
  FROM documents WHERE doc_id < 5
),
dyn AS (
  SELECT doc_id, filename, 'dynamic_fields.' || k AS field,
         k || ' ('
         || {_JTYPE_MAP.format(path=f"{_KI}.dynamic_fields.' || k || '")}
         || ')' AS label
  FROM docs, unnest(json_keys(j, '{_KI}.dynamic_fields')) t(k)
),
ents AS (
  SELECT doc_id, filename, 'structured_entities.' || k AS field,
         k || ' entity' AS label
  FROM docs, unnest(json_keys(j, '{_KI}.structured_entities')) t(k)
),
allf AS (SELECT * FROM dyn UNION ALL SELECT * FROM ents),
merged AS (
  SELECT field, first(label ORDER BY doc_id) AS label
  FROM allf GROUP BY field
)
SELECT * FROM (
  SELECT 'schema' AS kind, field AS key, label AS val FROM merged
  UNION ALL SELECT 'doc', filename, field FROM allf
) __u ORDER BY kind, key, val
"""


@register(
    "schema_discovery_nested",
    _SCHEMA_NESTED_SQL,
    note="§1.5 DEPTH-4 schema discovery at reference parity (VERDICT "
    "r9 #6, document_detail_query_handler.py:189-258): 5 sampled docs "
    "with CONFLICTING per-doc dynamic schemas; the walk descends "
    "analysis.ai_analysis_output.key_information and unions "
    "dynamic_fields (labeled '{name} ({python type})', FIRST-SEEN-WINS "
    "on type conflicts — exactly the reference's membership check, not "
    "a 'mixed' merge) and structured_entities ('{type} entity'), plus "
    "per-document field provenance (schema_by_document).  The oracle "
    "rebuilds the same JSON from the documents table and replays the "
    "walk with json_keys/json_type — the merged union AND the "
    "provenance rows hash-match.",
)
def q_schema_discovery_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.plans.query_spec import discover_document_schema

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 5)
        .orderBy("doc_id")
    )
    did = F.col("doc_id").cast("string")
    even = F.concat(
        F.lit('{"filename":"doc'), did,
        F.lit(
            '","analysis":{"ai_analysis_output":{"key_information":'
            '{"dynamic_fields":{"amount":'
        ),
        F.col("n_chars").cast("string"),
        F.lit(',"vendor":"'), F.col("source"),
        F.lit(
            '","meta":{"a":1}},'
            '"structured_entities":{"dates":["d"],"amounts":[1]}}}}}'
        ),
    )
    odd = F.concat(
        F.lit('{"filename":"doc'), did,
        F.lit(
            '","analysis":{"ai_analysis_output":{"key_information":'
            '{"dynamic_fields":{"amount":"'
        ),
        F.col("n_chars").cast("string"),
        F.lit(
            '","note":null,"score":1.5},'
            '"structured_entities":{"people":["p"]}}}}}'
        ),
    )
    jdocs = docs.select(
        F.when(F.col("doc_id") % 2 == 0, even).otherwise(odd).alias(
            "doc_json"
        )
    )
    schema, by_doc = discover_document_schema(jdocs, "doc_json", sample_n=5)
    rows = [("schema", k, v) for k, v in schema.items()] + [
        ("doc", fname, fld)
        for fname, flds in by_doc.items()
        for fld in flds
    ]
    return spark.createDataFrame(
        sorted(rows), "kind string, key string, val string"
    )


@register(
    "chunk_fixed_width",
    """
    SELECT doc_id,
           CAST(i AS INT) AS chunk_index,
           substring(text, CAST(i * 48 + 1 AS BIGINT), 64) AS chunk_text
    FROM documents,
         LATERAL unnest(range(0, CAST(ceil(greatest(length(text) - 16, 1)
                                           / 48.0) AS BIGINT))) AS t(i)
    WHERE doc_id < 100 AND length(text) > 0
    """,
    note="F2's plumbing with fixed-width windows (size 64, stride 48 = "
    "size − overlap 16), pure JVM sequence+substring — the "
    "SQL-expressible twin of the sentence-snapping chunker UDF "
    "(chunk_documents), so the explode shape itself is oracle-checked.",
)
def q_chunk_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    size, stride = 64, 48
    docs = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length("text") > 0))
    )
    n_chunks = F.ceil(
        F.greatest(F.length("text") - (size - stride), F.lit(1)) / stride
    ).cast("long")
    return docs.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("chunk_index", "__x"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.col("text")
        .substr(F.col("chunk_index") * stride + 1, F.lit(size))
        .alias("chunk_text"),
    )


@register(
    "json_roundtrip",
    """
    SELECT doc_id,
           to_json(struct_pack(doc_id := doc_id, lang := lang,
                               n_chars := n_chars)) AS doc_json
    FROM documents WHERE doc_id < 50
    """,
    note="F12: row → JSON serialization (to_json(struct(...))) — the "
    "engine's form of the reference's recursive JSON sanitize for LLM "
    "context assembly (document_detail_query_handler.py:47-58).",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.to_json(F.struct("doc_id", "lang", "n_chars")).alias(
                "doc_json"
            ),
        )
    )


@register(
    "daily_trend_streamed",
    f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) AS cnt,
           {oracle_davg('value')} AS avg_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
    note="ST4 as a first-class query: file-source stream → watermarked "
    "1-day tumbling windows → availableNow drain; hash-matching the "
    "BATCH oracle is the batch/stream parity proof.",
)
def q_daily_trend_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.streaming.pipeline import run_daily_trend_stream

    events = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="sortify_stream_")
    inp, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
    events.write.mode("overwrite").parquet(inp)
    q = run_daily_trend_stream(
        spark, inp, ckpt, out_table="daily_trend_streamed_out"
    )
    await_or_raise(q, 300, "stream")
    return spark.table("daily_trend_streamed_out").orderBy("day")


@register(
    "enrich_metadata",
    r"""
    WITH ai AS (
      SELECT doc_id, source,
             to_json(struct_pack(
               keywords := list_filter(string_split(text, ' '),
                                       x -> x <> '')[1:3],
               amounts := list_filter(string_split(text, ' '),
                                      x -> regexp_matches(x, '[0-9]')),
               dates := list_filter(string_split(text, ' '),
                                    x -> regexp_matches(x, '[0-9]{4}')),
               content_summary := substring(text, 1, 80)
             )) AS ai_json
      FROM documents WHERE doc_id < 200
    ),
    enriched AS (
      SELECT doc_id, source,
             json_array_length(ai_json, '$.keywords') AS keyword_count,
             json_array_length(ai_json, '$.amounts')
               + json_array_length(ai_json, '$.dates') AS entity_count,
             CASE WHEN json_array_length(ai_json, '$.amounts') > 0
                  THEN 1 ELSE 0 END AS has_amounts,
             CASE WHEN json_array_length(ai_json, '$.dates') > 0
                  THEN 1 ELSE 0 END AS has_dates,
             len(json_extract_string(ai_json, '$.content_summary'))
               AS content_length
      FROM ai
    )
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(keyword_count) AS BIGINT) AS keywords,
           CAST(SUM(entity_count) AS BIGINT) AS entities,
           CAST(SUM(has_amounts) AS BIGINT) AS docs_with_amounts,
           CAST(SUM(has_dates) AS BIGINT) AS docs_with_dates,
           CAST(SUM(content_length) AS BIGINT) AS summary_chars
    FROM enriched
    GROUP BY source ORDER BY source
    """,
    note="Entity-enrichment metadata derivation (reference "
    "entity_extraction_service.py:23-159): the AI-analysis JSON "
    "payload (here built deterministically from the text so both "
    "engines see identical documents: keywords, digit-bearing "
    "'amounts', 4-digit 'dates', summary) is parsed back and flattened "
    "into the precomputed filter metadata the reference stores "
    "(entity_count, keyword_count, has_amounts/has_dates, "
    "content_length), rolled up per source.  Round-trip through JSON "
    "on BOTH sides — serialization and typed re-parse are each "
    "covered; pure JVM expressions, one map-side-combined aggregate.",
)
def q_enrich_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    ai_json = F.to_json(
        F.struct(
            F.slice(words, 1, 3).alias("keywords"),
            F.filter(words, lambda x: x.rlike("[0-9]")).alias("amounts"),
            F.filter(words, lambda x: x.rlike("[0-9]{4}")).alias(
                "dates"
            ),
            F.substring("text", 1, 80).alias("content_summary"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("keywords", T.ArrayType(T.StringType())),
            T.StructField("amounts", T.ArrayType(T.StringType())),
            T.StructField("dates", T.ArrayType(T.StringType())),
            T.StructField("content_summary", T.StringType()),
        ]
    )
    ai = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "source", ai_json.alias("ai_json"))
    )
    p = F.from_json("ai_json", schema)
    enriched = ai.select(
        "source",
        F.size(p["keywords"]).alias("keyword_count"),
        (F.size(p["amounts"]) + F.size(p["dates"])).alias(
            "entity_count"
        ),
        F.when(F.size(p["amounts"]) > 0, 1).otherwise(0).alias(
            "has_amounts"
        ),
        F.when(F.size(p["dates"]) > 0, 1).otherwise(0).alias(
            "has_dates"
        ),
        F.length(p["content_summary"]).alias("content_length"),
    )
    return (
        enriched.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("keyword_count").cast("bigint").alias("keywords"),
            F.sum("entity_count").cast("bigint").alias("entities"),
            F.sum("has_amounts").cast("bigint").alias(
                "docs_with_amounts"
            ),
            F.sum("has_dates").cast("bigint").alias("docs_with_dates"),
            F.sum("content_length").cast("bigint").alias(
                "summary_chars"
            ),
        )
        .orderBy("source")
    )
