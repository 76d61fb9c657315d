"""QA pipeline tests: deterministic intent routing, rewrite, end-to-end
search path with diversity."""

from __future__ import annotations

from sortify_spark.qa import (
    AUTO_APPROVE_CONFIDENCE,
    Classification,
    answer_question,
    classify_question,
    rewrite_query,
)


def test_classifier_intents():
    cases = {
        "find documents about spark joins": "document_search",
        "what is the amount field value of invoice 7": "document_detail_query",
        "summarize document 3": "summarize_document",
        "compare invoice 1 and invoice 2": "compare_documents",
        "you said earlier that X": "conversation",
        "hmm": "unknown",
    }
    for q, intent in cases.items():
        got = classify_question(q)
        assert got.intent == intent, (q, got)
        assert 0.0 <= got.confidence <= 0.95


def test_classifier_deterministic():
    a = classify_question("find the report about revenue")
    b = classify_question("find the report about revenue")
    assert a == b


def test_rewrite_query():
    vs = rewrite_query("find documents about data query join")
    assert vs[0] == "find documents about data query join"
    assert len(vs) <= 2
    if len(vs) == 2:
        assert "find" not in vs[1].split()
        assert "data" in vs[1]


def test_auto_approve_threshold():
    c = Classification("document_search", 0.95)
    assert c.confidence >= AUTO_APPROVE_CONFIDENCE


def test_answer_question_search_path(spark):
    from sortify_spark.facade import SortifyEngine
    from tests.conftest import SF_DIR

    eng = SortifyEngine(spark, SF_DIR, dim=16)
    res = answer_question(eng, "find documents about data query join")
    assert res.intent == "document_search"
    assert res.results is not None
    rows = res.results.collect()
    assert rows and len(rows) <= 10
    assert len(res.variants) == 2

    detail = answer_question(eng, "what is the amount field value of doc 3")
    assert detail.intent == "document_detail_query"
    assert detail.results is None


def test_diversity_applied_on_results(spark):
    from sortify_spark.facade import SortifyEngine
    from sortify_spark.search.fusion import diversity_reselect
    from sortify_spark.tables import load_table
    from tests.conftest import SF_DIR
    import pyspark.sql.functions as F

    eng = SortifyEngine(spark, SF_DIR, dim=16)
    res = answer_question(eng, "find documents about data query join")
    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("string").alias("id"), "text"
    )
    hydrated = res.results.join(docs, "id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    rows = [r.asDict() for r in hydrated.collect()]
    final = diversity_reselect(rows, "text", top_k=5)
    assert len(final) <= 5


def test_answer_question_owner_scoped(spark):
    """The QA orchestration threads owner_id into every variant's
    search (P9): results ⊆ the owner's docs, two owners disjoint."""
    from pyspark.sql import functions as F

    from sortify_spark.facade import SortifyEngine
    from sortify_spark.qa import answer_question
    from tests.conftest import SF_DIR

    eng = SortifyEngine(
        spark, SF_DIR, dim=16, embed="expr", doc_limit=120,
        owner_col="source",
    )
    owners = [
        r["source"]
        for r in eng.documents.select("source").distinct()
        .orderBy("source").limit(2).collect()
    ]
    per = {}
    for o in owners:
        res = answer_question(
            eng, "find documents about data pipeline quality",
            owner_id=o,
        )
        assert res.results is not None
        ids = {r["id"] for r in res.results.collect()}
        docs = {
            str(r["doc_id"])
            for r in eng.documents.filter(F.col("source") == o)
            .select("doc_id").collect()
        }
        assert ids and ids <= docs, o
        per[o] = ids
    assert not (per[owners[0]] & per[owners[1]])
