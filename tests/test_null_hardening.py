"""Null/empty-input hardening: operators must not throw or mis-count on
null text, empty strings, or empty tables — the inputs a real 100 TB
corpus always contains even though the synthetic tables don't."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def dirty_docs(spark):
    rows = [
        (1, "normal document with several words here"),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "normal document with several words here"),  # dup of 1
        (6, "unicode 文本 with mixed  content!"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_with_nulls(dirty_docs):
    from sortify_spark.dedup import drop_exact_duplicates, exact_dedup_stats

    stats = exact_dedup_stats(dirty_docs).first()
    assert stats["total_docs"] == 6
    kept = drop_exact_duplicates(dirty_docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 in ids and 5 not in ids  # dup resolved to lowest id
    assert 2 in ids  # null row survives


def test_minhash_ignores_empty_docs(dirty_docs):
    from sortify_spark.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(dirty_docs, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 5)}


def test_simhash_ignores_empty_docs(dirty_docs):
    from sortify_spark.dedup import simhash_pairs

    pairs = simhash_pairs(dirty_docs, max_hamming=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 5)}


def test_chunker_null_and_empty(dirty_docs):
    from sortify_spark.functions.text import explode_chunks

    out = explode_chunks(dirty_docs, chunk_size=16, overlap=4)
    got = out.groupBy("doc_id").count().collect()
    by_id = {r["doc_id"]: r["count"] for r in got}
    assert by_id.get(1, 0) > 1  # real text chunks
    assert 2 not in by_id or by_id[2] == 0  # null text → no chunk rows
    assert out.filter(F.col("chunk_text") == "").count() == 0


def test_embed_null_is_zero_vector(spark):
    from sortify_spark.functions.vectors import hash_embed_udf

    df = spark.createDataFrame([(None,), ("",), ("word",)], ["t"])
    out = df.select(hash_embed_udf(8)(F.col("t")).alias("e")).collect()
    assert out[0]["e"] == [0.0] * 8
    assert out[1]["e"] == [0.0] * 8
    assert any(x != 0.0 for x in out[2]["e"])


def test_html_strip_null(spark):
    from sortify_spark.sources.email import html_to_text

    df = spark.createDataFrame([(None,), ("<b>x</b>",)], ["h"])
    got = df.select(html_to_text("h").alias("t")).collect()
    assert got[0]["t"] is None
    assert got[1]["t"] == "x"


def test_textstats_null_safe(spark):
    from sortify_spark.textstats import lang_id, quality_score, token_count

    df = spark.createDataFrame([(None, 0), ("hello the world", 15)],
                               ["text", "n_chars"])
    out = df.select(
        token_count(F.col("text")).alias("tc"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text"), F.col("n_chars")).alias("q"),
    ).collect()
    # null text must not raise; any sentinel/null output is acceptable
    assert out[1]["tc"] == 3


def test_empty_table_pipelines(spark):
    from sortify_spark.pipelines import ingest_vectorize

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert ingest_vectorize(empty, dim=4).count() == 0


def test_connected_components_empty_pairs(spark):
    from sortify_spark.dedup import connected_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    assert connected_components(empty, driver_max_edges=0).count() == 0


def test_repetition_words_null_and_short(spark, dirty_docs):
    """Null/empty/whitespace docs and one-word docs must be excluded
    (no divide-by-zero), normal docs scored."""
    from sortify_spark.dedup import words

    base = dirty_docs.select(
        "doc_id", words(F.col("text")).alias("w")
    ).filter(F.size("w") >= 2)
    ids = {r.doc_id for r in base.collect()}
    assert ids == {1, 5, 6}


def test_budget_sample_zero_token_stratum(spark):
    """A stratum whose token total is 0 must not produce NaN/err rates;
    its rate clamps to 1.0 and its (empty-token) rows pass through."""
    from sortify_spark.operators.sampling import budget_balanced_sample

    rows = [("a", 1, 10), ("a", 2, 30), ("b", 3, 0), ("b", 4, 0)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "tok"])
    kept = budget_balanced_sample(df, "source", F.col("tok"), "doc_id", 100)
    srcs = {r.source for r in kept.collect()}
    assert "b" in srcs  # inf-rate clamps to keep-all, never drops or errors


@pytest.fixture()
def dirty_src_docs(spark):
    rows = [
        (1, "a b c d e f g h i j k l m n o p", "web"),
        (2, None, "web"),
        (3, "", "web"),
        (4, "   ", "mail"),
        (5, "a b c d e f g h i j k l m n o p", "mail"),  # shares spans w/ 1
        (6, "short text", "mail"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_span_removal_nulls(dirty_src_docs):
    from sortify_spark.queries_curation2 import span_removal_stats

    out = {r["source"]: r for r in span_removal_stats(dirty_src_docs).collect()}
    # null/empty docs count as docs with 0 words, contribute no spans
    assert out["web"]["docs"] == 3 and out["mail"]["docs"] == 3
    # docs 1 and 5 share both 8-word spans -> all 16 words removed each
    assert out["web"]["words_removed"] == 16
    assert out["mail"]["words_removed"] == 16


def test_freq_buckets_skip_empty_docs(dirty_src_docs):
    from sortify_spark.queries_curation2 import freq_bucket_stats

    rows = freq_bucket_stats(dirty_src_docs).collect()
    # empty/null docs have no word rows: they simply don't enter tiers
    assert sum(r["docs"] for r in rows) == 3
    assert all(r["words"] > 0 for r in rows)


def test_sequence_packing_null_is_zero_tokens(dirty_src_docs):
    from sortify_spark.queries_curation2 import pack_sequences

    rows = pack_sequences(dirty_src_docs).collect()
    # no NULL sequence bucket; every doc lands in sequence 0 per source
    assert all(r["seq_id"] == 0 for r in rows)
    by_src = {r["source"]: r for r in rows}
    assert by_src["web"]["docs"] == 3 and by_src["web"]["tokens"] == 16
    assert by_src["mail"]["docs"] == 3 and by_src["mail"]["tokens"] == 18


def test_semdedup_null_embedding_never_dropped(spark):
    from sortify_spark.queries_curation2 import (
        semdedup_stats,
        semdedup_stats_np,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, None),               # null embedding
        (3, 0, [1.0, 0.0]),         # dup of 1 -> dropped
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    a = [tuple(r) for r in semdedup_stats(emb).collect()]
    b = [tuple(r) for r in semdedup_stats_np(emb).collect()]
    assert a == b == [(0, 3, 1, 2, 1 + 2)]


def test_discover_document_schema_tolerates_nulls(spark):
    """Real document JSON carries explicit nulls / non-object values on
    any level of the analysis walk — and sometimes a non-object top
    level.  Discovery must skip those docs' missing branches, not crash
    the whole sample (the unparseable-JSON path already skips)."""
    from sortify_spark.plans.query_spec import discover_document_schema

    rows = [
        # healthy doc — contributes fields
        ('{"filename":"a.pdf","analysis":{"ai_analysis_output":'
         '{"key_information":{"dynamic_fields":{"amount":12.5},'
         '"structured_entities":{"person":["x"]}}}}}',),
        ('{"filename":"b.pdf","analysis":null}',),
        ('{"filename":"c.pdf","analysis":{"ai_analysis_output":null}}',),
        ('{"filename":"d.pdf","analysis":{"ai_analysis_output":'
         '{"key_information":[1,2]}}}',),
        ('{"filename":"e.pdf","analysis":"pending"}',),
        ('["not","an","object"]',),
        ('not json at all',),
        # second healthy doc — first-seen-wins must still apply
        ('{"filename":"f.pdf","analysis":{"ai_analysis_output":'
         '{"key_information":{"dynamic_fields":{"amount":"12.5 EUR"}}}}}',),
    ]
    df = spark.createDataFrame(rows, ["doc_json"])
    schema, by_doc = discover_document_schema(df, "doc_json", sample_n=10)
    assert schema == {
        "dynamic_fields.amount": "amount (float)",
        "structured_entities.person": "person entity",
    }
    assert by_doc == {
        "a.pdf": [
            "dynamic_fields.amount",
            "structured_entities.person",
        ],
        "f.pdf": ["dynamic_fields.amount"],
    }
