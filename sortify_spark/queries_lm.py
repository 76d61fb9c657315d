"""Held-out bigram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2020) filters web text by the perplexity of a
language model trained on a HELD-OUT reference corpus — the model is
deliberately not trained on the data being scored.  This module is that
shape as one lazy plan:

- TRAIN: a deterministic slice of the corpus (``doc_id % LM_TRAIN_MOD
  == 0`` — the stand-in for "train on Wikipedia") distills into a
  bigram table ``c(w1, w2)``, a unigram table ``c(w1)``, and the vocab
  size ``V`` in one pass (map-side-combined hash-aggs).
- SCORE: every document's bigram stream is scored with the add-one
  conditional likelihood ``(c(w1,w2)+1) / (c(w1)+V)`` — the per-term
  ratio is two exact bigints and ONE IEEE division, rounded to 12
  decimals, then accumulated in DECIMAL (order-independent, see
  ``functions/numeric.py``), so Spark and DuckDB produce the identical
  per-doc mean.  No ``ln``/``exp`` anywhere: transcendental libm calls
  are the one place engines legitimately differ in the last ulp, so the
  score is the mean LIKELIHOOD (monotone inverse of perplexity), not
  the log form — same ordering, deterministic bits.
- FLAG: a document is low-quality when its mean likelihood falls below
  ``LM_REL_CUT`` x the corpus-wide mean (relative cut: scale-free
  across SFs, the CCNet head/middle/tail idea collapsed to one bit).

Complementary coverage: ``corpus_freq_buckets`` tiers by UNIGRAM corpus
frequency over the whole corpus; this is the conditional-bigram,
held-out-trained variant — a doc full of common words in improbable
ORDER scores low here but fine there.

Scale shape (100 TB): the LM tables derive from a bounded sample slice
(same contract as the PQ codebook / freq-tier vocab broadcast:
sample-distilled model fits executor memory) and are explicitly
``F.broadcast``-tagged, so the corpus-side bigram stream is never
shuffled — explode -> two broadcast hash joins -> per-doc partial agg
-> per-source agg, every aggregate map-side combined.  The only
exchanges carry per-doc then per-source rows.

Reference anchor: the reference's quality surface is rule-based
(ai_analysis_service.py heuristics); LM-likelihood filtering is a
beyond-reference curation operator from the published pipeline
literature (CCNet: Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.queries import register, _t

LM_TRAIN_MOD = 5  #: doc_id % MOD == 0 -> held-out LM training slice
LM_REL_CUT = 0.85  #: low-quality if like < CUT * corpus mean like
_DEC = "decimal(38,12)"


def _words(col="text"):
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, w1, w2) — one row per overlapping bigram."""
    w = _words()
    return (
        docs.select("doc_id", "source", w.alias("__w"))
        .filter(F.size("__w") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.struct(
                        F.element_at("__w", i).alias("w1"),
                        F.element_at("__w", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "source", "bg.w1", "bg.w2")
    )


def _bigram_per_doc(docs: DataFrame) -> DataFrame:
    """The corpus-scoring subtree: per-doc mean bigram likelihood under
    the held-out LM (broadcast bigram/unigram/vocab tables — the corpus
    bigram stream is never shuffled).  Split out so the plan-shape test
    can assert the broadcast discipline BELOW the checkpoint
    ``bigram_lm_quality`` adds on top."""
    train = docs.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
    uni = (
        train.select(F.explode(_words()).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        _bigrams(train)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    term = F.round(
        (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast(
            "double"
        ),
        12,
    )
    return (
        _bigrams(docs)
        .join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.sum(term.cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("like")
        )
    )


def bigram_lm_quality(docs: DataFrame) -> DataFrame:
    """Per source: scored docs, mean per-doc bigram likelihood, and the
    count of docs below the relative low-quality cut.

    Pass shape (r13): the per-doc frame feeds BOTH the corpus-mean
    aggregate and the final per-source aggregate — one materialization
    (doc-count rows, blocks freed by the context cleaner) instead of
    running the corpus bigram scoring twice.  The accumulations stay
    DECIMAL/bigint, so the change cannot move a bit.  (A scan fan-out
    was ALSO measured here and REJECTED: three repartition consumers +
    the broadcast-table builds made it a net loss — 2.15 s → 2.88 s
    median in an alternating same-session A/B.)"""
    per_doc = _bigram_per_doc(docs).localCheckpoint(eager=False)
    gmean = per_doc.agg(
        F.round(
            F.sum(F.col("like").cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("gmean")
    )
    return (
        per_doc.crossJoin(F.broadcast(gmean))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(
                F.sum(F.col("like").cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_like"),
            F.sum(
                F.when(
                    F.col("like") < F.lit(LM_REL_CUT) * F.col("gmean"),
                    1,
                ).otherwise(0)
            ).alias("low_docs"),
        )
        .orderBy("source")
    )


_WORDS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"

_LM_SQL = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS_SQL} AS w FROM documents
),
tw AS (SELECT * FROM w WHERE doc_id % {LM_TRAIN_MOD} = 0),
uni AS (
  SELECT u.w1, COUNT(*) AS c1
  FROM (SELECT unnest(w) AS w1 FROM tw) u GROUP BY u.w1
),
vocab AS (SELECT COUNT(*) AS v FROM uni),
tbg0 AS (
  SELECT unnest(list_transform(range(1, len(w)),
             i -> [w[i], w[i + 1]])) AS p
  FROM tw WHERE len(w) >= 2
),
bi AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12
  FROM tbg0 GROUP BY 1, 2
),
bg0 AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w)),
             i -> [w[i], w[i + 1]])) AS p
  FROM w WHERE len(w) >= 2
),
bg AS (
  SELECT doc_id, source, p[1] AS w1, p[2] AS w2 FROM bg0
),
scored AS (
  SELECT bg.doc_id, bg.source,
         ROUND(CAST(COALESCE(bi.c12, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(uni.c1, 0) + vocab.v AS DOUBLE),
               12) AS term
  FROM bg
  LEFT JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
  LEFT JOIN uni ON bg.w1 = uni.w1
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, source,
         ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 9) AS lk
  FROM scored GROUP BY doc_id, source
),
g AS (
  SELECT ROUND(CAST(SUM(CAST(lk AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 9) AS gmean
  FROM per_doc
)
SELECT source, COUNT(*) AS docs,
       ROUND(CAST(SUM(CAST(lk AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mean_like,
       SUM(CASE WHEN lk < {LM_REL_CUT} * g.gmean THEN 1 ELSE 0 END)
           AS low_docs
FROM per_doc, g
GROUP BY source
ORDER BY source
"""


@register(
    "bigram_lm_quality",
    _LM_SQL,
    note="CCNet-style held-out bigram-LM quality scoring: the LM "
    f"(bigram+unigram counts, add-one smoothing) trains on the doc_id "
    f"% {LM_TRAIN_MOD} == 0 slice only and scores EVERY doc's mean "
    "conditional bigram likelihood (one IEEE division per term, "
    "DECIMAL accumulation — no transcendentals, so both engines "
    "produce identical bits); docs below "
    f"{LM_REL_CUT}x the corpus mean are flagged low-quality.  "
    "Broadcast LM tables: the corpus bigram stream is never shuffled.",
)
def q_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_quality(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Gopher rule battery (Rae et al. 2021, Appendix A1.1)
# ---------------------------------------------------------------------------

#: Corpus-calibrated thresholds for the published Gopher quality rules
#: (the paper's absolute numbers — 50..100k words, mean word length
#: 3..10 — are tuned for web pages; this corpus's synthetic documents
#: run 10-99 words, so the bounds are scaled to keep every rule's
#: semantics while rejecting a real fraction at every SF).
GOPHER_WC_MIN, GOPHER_WC_MAX = 30, 90
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 3.0, 5.0
GOPHER_ALPHA_FRAC_MIN = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_ALPHA_RE = "[A-Za-z]"


def _gopher_flags(text: Column) -> dict[str, Column]:
    """Row-local rule flags as pure Catalyst expressions (no UDF, no
    explode — the token array never leaves the row).  Divisions are
    per-row IEEE doubles, bit-identical to the DuckDB twin because no
    aggregation order is involved."""
    toks = F.split(text, " ")
    wc = F.size(toks)
    chars = F.length(F.regexp_replace(text, " ", ""))
    mwl = chars.cast("double") / wc
    alpha = F.size(F.filter(toks, lambda t: t.rlike(_ALPHA_RE)))
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    stop_any = F.lit(False)
    for w in GOPHER_STOPWORDS:
        stop_any = stop_any | padded.like(f"% {w} %")
    return {
        "wc_ok": (wc >= GOPHER_WC_MIN) & (wc <= GOPHER_WC_MAX),
        "mwl_ok": (mwl >= GOPHER_MWL_MIN) & (mwl <= GOPHER_MWL_MAX),
        "alpha_ok": alpha.cast("double") / wc >= GOPHER_ALPHA_FRAC_MIN,
        "stop_ok": stop_any,
    }


def gopher_quality_rules(docs: DataFrame) -> DataFrame:
    """Per-source Gopher rule attribution: docs, per-rule fail counts,
    and the count passing ALL rules.

    One projection + one hash aggregate: every rule is a row-local
    codegen expression, so the corpus is read once and only per-source
    rows shuffle.  Per-rule attribution is the point: a composite
    boolean tells you WHAT was lost, not WHY.
    """
    flags = _gopher_flags(F.col("text"))
    d = docs.select("source", *[c.alias(k) for k, c in flags.items()])

    def fails(k: str) -> Column:
        return F.sum(F.when(~F.col(k), 1).otherwise(0)).alias(
            f"fail_{k[:-3]}"
        )

    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            fails("wc_ok"),
            fails("mwl_ok"),
            fails("alpha_ok"),
            fails("stop_ok"),
            F.sum(
                F.when(
                    F.col("wc_ok")
                    & F.col("mwl_ok")
                    & F.col("alpha_ok")
                    & F.col("stop_ok"),
                    1,
                ).otherwise(0)
            ).alias("pass_all"),
        )
        .orderBy("source")
    )


def _gopher_sql() -> str:
    """DuckDB rendering of the same rules (engine-specific function
    names — string_split/list_filter/regexp_matches — same row-local
    arithmetic)."""
    wc = "len(string_split(text, ' '))"
    chars = "LENGTH(REPLACE(text, ' ', ''))"
    alpha = (
        "len(list_filter(string_split(text, ' '), "
        f"t -> regexp_matches(t, '{_ALPHA_RE}')))"
    )
    stop_any = " OR ".join(
        f"(' ' || text || ' ') LIKE '% {w} %'" for w in GOPHER_STOPWORDS
    )
    return f"""
    WITH d AS (
      SELECT source,
             ({wc} >= {GOPHER_WC_MIN} AND {wc} <= {GOPHER_WC_MAX}) AS wc_ok,
             (CAST({chars} AS DOUBLE) / {wc} >= {GOPHER_MWL_MIN}
              AND CAST({chars} AS DOUBLE) / {wc} <= {GOPHER_MWL_MAX}) AS mwl_ok,
             (CAST({alpha} AS DOUBLE) / {wc} >= {GOPHER_ALPHA_FRAC_MIN})
               AS alpha_ok,
             ({stop_any}) AS stop_ok
      FROM documents
    )
    SELECT source, COUNT(*) AS docs,
           SUM(CASE WHEN NOT wc_ok THEN 1 ELSE 0 END) AS fail_wc,
           SUM(CASE WHEN NOT mwl_ok THEN 1 ELSE 0 END) AS fail_mwl,
           SUM(CASE WHEN NOT alpha_ok THEN 1 ELSE 0 END) AS fail_alpha,
           SUM(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END) AS fail_stop,
           SUM(CASE WHEN wc_ok AND mwl_ok AND alpha_ok AND stop_ok
                    THEN 1 ELSE 0 END) AS pass_all
    FROM d GROUP BY source ORDER BY source
    """


@register(
    "gopher_quality_rules",
    _gopher_sql(),
    note="Gopher rule battery (Rae et al. 2021 A1.1, corpus-calibrated "
    f"bounds): word count {GOPHER_WC_MIN}-{GOPHER_WC_MAX}, mean word "
    f"length {GOPHER_MWL_MIN}-{GOPHER_MWL_MAX}, alphabetic-token "
    f"fraction >= {GOPHER_ALPHA_FRAC_MIN}, >= 1 Gopher stopword.  "
    "Per-source per-rule fail attribution + pass-all count; every rule "
    "is a row-local codegen expression (no UDF, no explode), corpus "
    "read once, only per-source rows shuffle.",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_rules(_t(spark, sf_dir, "documents"))
