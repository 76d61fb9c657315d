"""QA pipeline data plane (SURVEY.md §3.3): intent routing → search or
detail-query → context assembly.

Every LLM stage is a pluggable callable with a deterministic rule-based
default (§2.12), so the full QA flow runs hermetically: intent
classification (7 intents, ``question_classifier_service.py:40-150``),
query rewrite (≤2 variants, ``qa_query_rewriter.py:22-92``), strategy
suggestion (V7), and spec generation (P8).  The engine owns everything
downstream of the model call: the plans.

ST3 (SSE token streaming of the generated answer,
``qa_orchestrator.py:464-620``) is a serving concern with no data-plane
semantics and is deliberately out of engine scope (SURVEY.md §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from sortify_spark.search import fusion

#: Reference intent set (``question_models.py:11-19``).
INTENTS = (
    "document_search",
    "document_detail_query",
    "summarize_document",
    "compare_documents",
    "general_knowledge",
    "conversation",
    "unknown",
)

AUTO_APPROVE_CONFIDENCE = 0.90  # document_search_handler.py:80


@dataclass
class Classification:
    intent: str
    confidence: float
    strategy: str = "hybrid"
    complexity: str = "simple"


def classify_question(question: str) -> Classification:
    """Deterministic rule-based classifier standing in for the LLM stage.
    Keyword cues → intent; confidence from cue strength."""
    q = question.lower()
    rules = (
        ("document_detail_query", ("field", "value of", "amount", "detail")),
        ("summarize_document", ("summarize", "summary of", "tl;dr")),
        ("compare_documents", ("compare", "difference between")),
        ("conversation", ("you said", "earlier", "previous answer")),
        ("document_search", ("find", "search", "which document", "about")),
    )
    for intent, cues in rules:
        hits = sum(1 for c in cues if c in q)
        if hits:
            return Classification(
                intent=intent,
                confidence=min(0.95, 0.6 + 0.15 * hits),
                strategy=fusion.select_strategy(
                    "detailed" if intent == "document_detail_query" else None
                ),
            )
    if q.endswith("?") and len(q.split()) > 3:
        return Classification("general_knowledge", 0.5)
    return Classification("unknown", 0.3)


def rewrite_query(question: str, max_variants: int = 2) -> list[str]:
    """Deterministic query-rewrite stub: original + a keyword-only variant
    (top content words), capped at the reference's ≤2 used variants."""
    words = [w.strip("?.,!") for w in question.lower().split()]
    stop = {"the", "a", "an", "of", "is", "are", "what", "which", "find",
            "search", "about", "for", "in", "to", "me"}
    keywords = [w for w in words if w and w not in stop]
    variants = [question]
    if keywords and " ".join(keywords) != question:
        variants.append(" ".join(keywords[:8]))
    return variants[:max_variants]


@dataclass
class QAResult:
    intent: str
    confidence: float
    auto_approved: bool
    results: DataFrame | None
    variants: list[str] = field(default_factory=list)


def answer_question(
    engine, question: str, top_k: int = 10, owner_id: str | None = None
) -> QAResult:
    """§3.3 orchestration over the facade: classify → route → plan.

    ``document_search``: rewrite into ≤2 weighted variants (F18 weights),
    run the facade search per variant, keep-max merge (V6), diversity is
    applied by the caller on the collected top rows (O6, bounded).
    ``document_detail_query``: route to the spec path (caller supplies or
    generates the spec).  Other intents return no data-plane results.

    ``owner_id`` scopes every variant's search to one tenant (P9 — the
    reference's QA flow carries the requesting user into every vector
    scan, ``vector_db_service.py:199-221``).
    """
    cls = classify_question(question)
    auto = cls.confidence >= AUTO_APPROVE_CONFIDENCE
    if cls.intent in ("document_search", "summarize_document",
                      "compare_documents", "unknown"):
        from pyspark.sql import functions as F

        variants = rewrite_query(question)
        scored = []
        for v in variants:
            df = engine.semantic_search(
                v, search_type=cls.strategy, owner_id=owner_id
            )
            score_col = "rrf_score" if "rrf_score" in df.columns else "score"
            scored.append(
                df.select(
                    F.col("id"),
                    F.col(score_col).cast("double").alias("score"),
                )
            )
        merged = fusion.multi_query_merge(scored, top_k=top_k)
        return QAResult(cls.intent, cls.confidence, auto, merged, variants)
    return QAResult(cls.intent, cls.confidence, auto, None, [])
