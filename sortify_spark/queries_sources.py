"""Source-layer queries: conversation-style array counters (A10) with an
oracle, and HTML-strip over constructed payloads."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.operators.filters import slice_last_n
from sortify_spark.queries import register, _t


@register(
    "conversation_counters",
    """
    SELECT user_id,
           COUNT(*) AS message_count,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS total_tokens,
           array_to_string(
             list_slice(list(event_type ORDER BY ts ASC, event_id ASC),
                        greatest(COUNT(*) - 4, 1), COUNT(*)), '|')
               AS last5_types
    FROM events GROUP BY user_id
    """,
    note="A10+P7: conversation running counters — message_count, token "
    "sum, and a $slice:-5 tail of the time-ordered message array "
    "(crud_conversations.py:150-156,199-201) over the events-as-messages "
    "analog. Deterministic array order via sortable struct collect.",
)
def q_conversation_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    msgs = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    types_in_order = F.transform(msgs, lambda m: m.getField("event_type"))
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("message_count"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias(
            "total_tokens"
        ),
        F.array_join(slice_last_n(types_in_order, 5), "|").alias("last5_types"),
    )


@register(
    "html_strip",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
               '<p>' || text || '</p><script>x()</script><style>s</style>',
               '<script[^>]*>.*?</script>', ' ', 'gis'),
               '<style[^>]*>.*?</style>', ' ', 'gis'),
               '<[^>]+>', ' ', 'g')) AS stripped_head
    FROM documents WHERE doc_id < 50
    """,
    note="F17: HTML→text as pure regexp_replace expressions "
    "(gmail_service.py:30-76) — payload constructed by wrapping document "
    "text in markup so both engines strip identically.",
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    html = F.concat(
        F.lit("<p>"),
        F.col("text"),
        F.lit("</p><script>x()</script><style>s</style>"),
    )
    no_script = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?is)<style[^>]*>.*?</style>", " ")
    no_tags = F.regexp_replace(no_style, r"<[^>]+>", " ")
    return docs.select("doc_id", F.trim(no_tags).alias("stripped_head"))


@register(
    "vector_delete_rewrite",
    """
    SELECT label, COUNT(*) AS remaining
    FROM embeddings
    WHERE vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id % 97 = 0)
    GROUP BY label
    """,
    note="S10: vector delete-by-id (vector_db_service.py:263-323) over an "
    "immutable columnar store — the deletion id-list becomes a broadcast "
    "LEFT ANTI join and the table is rewritten with the survivors (Delta "
    "turns the same plan into a real DELETE). Remaining-per-label counts "
    "verify the survivors exactly.",
)
def q_vector_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    to_delete = emb.filter(F.col("vec_id") % 97 == 0).select("vec_id")
    return (
        emb.join(F.broadcast(to_delete), "vec_id", "left_anti")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("remaining"))
    )


@register(
    "chunks_for_document",
    None,  # chunk boundaries come from the Python chunker UDF
    note="V8: fetch-all-chunks-by-document (vector_db_service.py:429-474) "
    "— the facade's vectors table filtered to one (document_id, owner_id) "
    "in chunk order; partition-prunes to nothing at scale when the "
    "vectors table is written partitioned by owner.",
)
def q_chunks_for_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.facade import get_engine

    eng = get_engine(spark, sf_dir, dim=16)
    return eng.document_chunks("7", owner_id="default").select(
        "document_id", "chunk_index", "total_chunks", "chunk_text"
    )


# --- small keyed collections (§1.2 tail: suggested_questions /
# device_tokens lifecycle over operators/keyed_tables) ----------------------


@register(
    "suggested_questions_lifecycle",
    """
    SELECT user_id, event_type AS question,
           COUNT(*) AS use_count,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_used_us
    FROM events GROUP BY user_id, event_type
    """,
    note="suggested_questions $inc-upsert algebra "
    "(crud_suggested_questions.py:132-186): per-user question counters "
    "built in TWO batches and merged with inc_upsert (counters add, "
    "last-used takes greatest) must equal ONE aggregation over all "
    "events — the keyed-counter upsert contract hash-checked. "
    "Full-outer join of two small keyed aggregates; the corpus-side "
    "aggregation is map-side combined.",
)
def q_suggested_questions_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sortify_spark.operators.keyed_tables import inc_upsert

    events = _t(spark, sf_dir, "events")

    def batch(pred):
        return (
            events.filter(pred)
            .groupBy("user_id", F.col("event_type").alias("question"))
            .agg(
                F.count(F.lit(1)).alias("use_count"),
                F.unix_micros(F.max("ts")).alias("last_used_us"),
            )
        )

    a = batch(F.col("event_id") % 3 != 0)
    b = batch(F.col("event_id") % 3 == 0)
    return inc_upsert(
        a,
        b,
        keys=["user_id", "question"],
        inc_cols=["use_count"],
        max_cols=["last_used_us"],
    )


@register(
    "device_token_rotate",
    """
    WITH base AS (
      SELECT CAST(user_id % 20 AS BIGINT) AS device_id,
             MAX(ts) AS max_ts
      FROM events GROUP BY 1
    ),
    final AS (
      SELECT device_id,
             CASE WHEN device_id < 10
                  THEN md5('rotated' || CAST(device_id AS VARCHAR))
                  ELSE md5('initial' || CAST(device_id AS VARCHAR))
             END AS refresh_token,
             CAST(epoch_us(max_ts) AS BIGINT) AS last_used_us,
             NOT (device_id % 7 = 0) AS is_active
      FROM base
    )
    SELECT device_id, refresh_token, last_used_us, is_active FROM final
    """,
    note="device_tokens lifecycle (crud_device_tokens.py:66-256): "
    "create → rotate refresh token for half the devices (keyed $set "
    "upsert, last write wins) → deactivate every 7th device — the final "
    "table state hash-checked. Updates broadcast; the token table never "
    "shuffles.",
)
def q_device_token_rotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.operators.keyed_tables import (
        deactivate_tokens,
        keyed_set_upsert,
    )

    events = _t(spark, sf_dir, "events")
    base = (
        events.groupBy((F.col("user_id") % 20).alias("device_id"))
        .agg(F.unix_micros(F.max("ts")).alias("last_used_us"))
    )
    initial = base.select(
        "device_id",
        F.md5(
            F.concat(F.lit("initial"), F.col("device_id").cast("string"))
            .cast("binary")
        ).alias("refresh_token"),
        "last_used_us",
        F.lit(True).alias("is_active"),
    )
    rotated = initial.filter(F.col("device_id") < 10).withColumn(
        "refresh_token",
        F.md5(
            F.concat(F.lit("rotated"), F.col("device_id").cast("string"))
            .cast("binary")
        ),
    )
    upserted = keyed_set_upsert(initial, rotated, ["device_id"])
    stale = upserted.filter(F.col("device_id") % 7 == 0).select("device_id")
    return deactivate_tokens(upserted, stale).select(
        "device_id", "refresh_token", "last_used_us", "is_active"
    )


# --- CDC classification kernel (sources/versioned.classify_changes):
# hash-checked over two DERIVED snapshots of events, so the versioned
# store's diff logic is driver-verified without needing writable state
# in an oracle query (same modeling move as vector_delete_rewrite).
# Scenario: v2 deletes event_id%97==0, bumps value by 1.0 where
# event_id%31==0, and inserts clones at event_id+10000000 where
# event_id%113==0.

_CDC_SQL = """
WITH old AS (
  SELECT event_id, user_id, event_type, value FROM events
),
new AS (
  SELECT event_id, user_id, event_type,
         value + (CASE WHEN event_id % 31 = 0 THEN 1.0 ELSE 0.0 END) AS value
  FROM events WHERE event_id % 97 <> 0
  UNION ALL
  SELECT event_id + 10000000, user_id, event_type, value
  FROM events WHERE event_id % 113 = 0
),
j AS (
  SELECT COALESCE(o.event_id, n.event_id) AS event_id,
         o.event_id IS NOT NULL AS in_o, n.event_id IS NOT NULL AS in_n,
         o.user_id AS o_user, o.event_type AS o_type, o.value AS o_value,
         n.user_id AS n_user, n.event_type AS n_type, n.value AS n_value,
         ((o.user_id IS DISTINCT FROM n.user_id)
          OR (o.event_type IS DISTINCT FROM n.event_type)
          OR (o.value IS DISTINCT FROM n.value)) AS changed
  FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
)
SELECT event_id, o_user AS user_id, o_type AS event_type,
       o_value AS value, 'delete' AS _change_type
FROM j WHERE in_o AND NOT in_n
UNION ALL
SELECT event_id, n_user, n_type, n_value, 'insert'
FROM j WHERE in_n AND NOT in_o
UNION ALL
SELECT event_id, o_user, o_type, o_value, 'update_preimage'
FROM j WHERE in_o AND in_n AND changed
UNION ALL
SELECT event_id, n_user, n_type, n_value, 'update_postimage'
FROM j WHERE in_o AND in_n AND changed
"""


@register(
    "cdc_classify",
    _CDC_SQL,
    note="CDC kernel of the versioned store (sources/versioned.py "
    "classify_changes — the engine behind snapshot diff): insert / "
    "delete / update-preimage+postimage classification via one "
    "co-partitioned full-outer join and a null-safe payload compare, "
    "hash-checked against a DuckDB replay over derived event "
    "snapshots.  Scale: cost ∝ changed-partition footprint (manifest "
    "pruning in diff()); the join shuffles both sides once on the key.",
)
def q_cdc_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.sources.versioned import classify_changes

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    old = ev
    new = ev.filter(F.col("event_id") % 97 != 0).withColumn(
        "value",
        F.col("value")
        + F.when(F.col("event_id") % 31 == 0, F.lit(1.0)).otherwise(
            F.lit(0.0)
        ),
    ).unionByName(
        ev.filter(F.col("event_id") % 113 == 0).withColumn(
            "event_id", F.col("event_id") + F.lit(10000000)
        )
    )
    return classify_changes(old, new, ["event_id"])
