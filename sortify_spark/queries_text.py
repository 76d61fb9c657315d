"""Text-analysis queries with DuckDB oracles: language ID, quality
scoring, token stats, fingerprint dedup, chunking plumbing.

The scalar logic lives in :mod:`sortify_spark.textstats`, which renders
both the Spark Column and the oracle SQL from one config — engine and
oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark import textstats as ts
from sortify_spark.dedup import exact_dedup_stats
from sortify_spark.functions.text import explode_chunks
from sortify_spark.queries import register, _t


@register(
    "lang_distribution",
    f"""
    SELECT {ts.lang_id_sql('text')} AS lang_pred, COUNT(*) AS cnt
    FROM documents GROUP BY 1
    """,
    note="Language ID: marker-token argmax with fixed tie-break priority; "
    "pure expression (no UDF), distribution aggregated per predicted "
    "language.",
)
def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(ts.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "quality_scores",
    f"""
    SELECT doc_id,
           {ts.TOKEN_COUNT_SQL.format(t='text')} AS tokens,
           {ts.quality_score_sql('text', 'n_chars')} AS quality
    FROM documents
    """,
    note="Quality scoring: length/token/stopword composite in [0,1] — "
    "the curation filter a 100 TB corpus pipeline runs before training; "
    "JVM-side expressions only.",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ts.token_count(F.col("text")).alias("tokens"),
        ts.quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
    )


@register(
    "token_stats_by_source",
    f"""
    SELECT source,
           CAST(SUM({ts.TOKEN_COUNT_SQL.format(t='text')}) AS BIGINT)
               AS total_tokens,
           ROUND(CAST(SUM({ts.TOKEN_COUNT_SQL.format(t='text')}) AS DOUBLE)
                 / COUNT(*), 4) AS avg_tokens,
           COUNT(*) AS docs
    FROM documents GROUP BY source
    """,
    note="Token counting rollup per source — corpus accounting (the "
    "token-budget view every training-data pipeline needs).",
)
def q_token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = ts.token_count(F.col("text"))
    return (
        docs.select("source", toks.alias("t"))
        .groupBy("source")
        .agg(
            F.sum("t").cast("bigint").alias("total_tokens"),
            F.round(F.sum("t").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_tokens"
            ),
            F.count(F.lit(1)).alias("docs"),
        )
    )


@register(
    "dedup_exact_stats",
    f"""
    SELECT COUNT(*) AS total_docs,
           COUNT(DISTINCT {ts.FINGERPRINT_SQL.format(t='text')})
               AS distinct_docs,
           COUNT(*) - COUNT(DISTINCT {ts.FINGERPRINT_SQL.format(t='text')})
               AS duplicate_docs
    FROM documents
    """,
    note="Exact dedup via content fingerprint (md5 of normalized text) — "
    "hash-groupBy dedup, one aggregate pass.",
)
def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_stats(_t(spark, sf_dir, "documents"))


@register(
    "ngram_jaccard_sample",
    """
    WITH base AS (
      SELECT doc_id AS id,
             list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))
                 AS toks
      FROM documents WHERE doc_id < 30
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks)
                    - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
    FROM base a JOIN base b ON a.id < b.id
    """,
    note="n-gram Jaccard (word-level) all-pairs similarity on a bounded "
    "id block — the exact-verify kernel the MinHash-LSH pipeline calls "
    "on candidates; k-word shingles via dedup.shingles for k>1.",
)
def q_ngram_jaccard_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.dedup import jaccard, token_set

    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select(F.col("doc_id").alias("id"), token_set(F.col("text")).alias("toks"))
    )
    a, b = base.alias("a"), base.alias("b")
    return a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(jaccard(F.col("a.toks"), F.col("b.toks")), 6).alias("jaccard"),
    )


@register(
    "chunk_documents",
    None,  # chunker is a pandas UDF — no SQL twin; property-tested locally
    note="F2 chunker plumbing: UDF → array<string> → posexplode into "
    "(doc_id, chunk_index, total_chunks) rows; chunk 64/overlap 16 to "
    "exercise multi-chunk paths on the short synthetic docs. Invariants "
    "(coverage, bounds, overlap) in tests/test_text_ops.py.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = explode_chunks(docs, chunk_size=64, overlap=16)
    return out.select(
        "doc_id",
        "chunk_index",
        "total_chunks",
        F.length("chunk_text").alias("chunk_len"),
    )


@register(
    "repetition_signals",
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    base AS (SELECT * FROM w WHERE len(w) >= 2),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])) AS bg
      FROM base
    ),
    top AS (
      SELECT doc_id, MAX(c) AS top_bg FROM (
        SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           len(b.w) AS n_words,
           ROUND(1 - len(list_distinct(b.w)) / CAST(len(b.w) AS DOUBLE), 6)
               AS dup_word_frac,
           ROUND(t.top_bg / CAST(len(b.w) - 1 AS DOUBLE), 6)
               AS top_bigram_frac
    FROM base b JOIN top t USING (doc_id)
    ORDER BY b.doc_id
    """,
    note="Gopher-style repetition signals per doc: duplicate-word "
    "fraction and most-frequent-bigram fraction (the 'fraction of "
    "content in top n-gram' family used by Gopher/RefinedWeb quality "
    "rules). Bigrams via zip_with over two array slices — no UDF; the "
    "explode shuffles on (doc_id, bigram) with map-side combine, then "
    "one more combine down to per-doc maxima. Both shuffles carry "
    "~tokens-per-doc rows, never corpus²; scale-safe.",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.dedup import words

    docs = _t(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", words(F.col("text")).alias("w"))
        .filter(F.size("w") >= 2)
    )
    bigrams = base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.expr(
            "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), "
            "(a, b) -> concat(a, ' ', b))"
        ).alias("bgs"),
    )
    top = (
        bigrams.select("doc_id", "n_words", "n_distinct", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "n_words", "n_distinct", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_words", "n_distinct")
        .agg(F.max("c").alias("top_bg"))
    )
    return top.select(
        "doc_id",
        "n_words",
        F.round(
            F.lit(1) - F.col("n_distinct") / F.col("n_words").cast("double"), 6
        ).alias("dup_word_frac"),
        F.round(
            F.col("top_bg") / (F.col("n_words") - 1).cast("double"), 6
        ).alias("top_bigram_frac"),
    ).orderBy("doc_id")


def _pii_audit_sql() -> str:
    """Oracle for ``pii_scrub_audit``: plants the same deterministic
    PII-shaped tokens and replays the engine's chained-regexp redaction
    (``functions/text.py:PII_PATTERNS``) in DuckDB.  Patterns are shared
    constants, so engine and oracle cannot drift.  Patterns are spliced
    verbatim into single-quoted SQL literals, so they must contain no
    single quote and must stay in the Java-regex/RE2 common subset (see
    the constraint note on ``PII_PATTERNS``)."""
    from sortify_spark.functions.text import PII_PATTERNS

    for name, pat, token in PII_PATTERNS:
        if "'" in pat or "'" in token:
            raise ValueError(
                f"PII pattern {name!r} contains a single quote; the DuckDB "
                "oracle splices patterns into single-quoted literals"
            )

    counts = ", ".join(
        f"CAST(SUM(len(regexp_extract_all(text_p, '{pat}'))) AS BIGINT)"
        f" AS {name}_hits"
        for name, pat, _ in PII_PATTERNS
    )
    red = "text_p"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
    WITH planted AS (
      SELECT source,
             text
             || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
                  || CAST(doc_id AS VARCHAR) || '@example.com now'
                ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                THEN ' card 4111 1111 1111 1111 on file' ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                THEN ' call +1 (555) 123-4567 today' ELSE '' END AS text_p
      FROM documents
    )
    SELECT source, {counts},
           CAST(SUM(length({red})) AS BIGINT) AS redacted_chars,
           COUNT(*) AS docs
    FROM planted GROUP BY source
    """


@register(
    "pii_scrub_audit",
    _pii_audit_sql(),
    note="PII scrubbing audit (text hygiene for the curation pipeline — "
    "reference stores raw extracted text; a training pipeline must scrub "
    "it): deterministic PII-shaped tokens (email/card/phone) are planted "
    "on doc_id strata, then redact_pii + pii_counts run over every doc. "
    "Per-source hit counts AND the total redacted length are hash-checked,"
    " so both the counters and the actual rewritten text are verified. "
    "Chained regexp_replace stays whole-stage-codegen — no UDF, no "
    "shuffle beyond the final small groupBy.",
)
def q_pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.functions.text import PII_PATTERNS, pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    text_p = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit(" card 4111 1111 1111 1111 on file"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit(" call +1 (555) 123-4567 today"),
        ).otherwise(F.lit("")),
    )
    from sortify_spark.operators.partitioning import fan_out

    # the chained regex extract/replace is codegen but ALL of it runs in
    # the scan stage — fan the tiny single-file scan out to every core
    # first (cluster no-op); integer sums only downstream
    audited = fan_out(docs).select(
        "source",
        pii_counts(text_p).alias("counts"),
        F.length(redact_pii(text_p)).alias("red_len"),
    )
    return audited.groupBy("source").agg(
        *[
            F.sum(F.col("counts")[name]).cast("bigint").alias(f"{name}_hits")
            for name, _, _ in PII_PATTERNS
        ],
        F.sum("red_len").cast("bigint").alias("redacted_chars"),
        F.count(F.lit(1)).alias("docs"),
    )


# --- BM25 keyword retrieval ------------------------------------------------

_BM25_TERMS = ("data", "query", "join")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_sql() -> str:
    """DuckDB twin of the BM25 plan below: identical tokenization,
    decimal-exact (rounded) avgdl, same idf/tf saturation formula,
    score rounded to 4 to absorb libm ulp differences in ln()."""
    tfs = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1) * tf{i} * {_BM25_K1 + 1}"
        f" / (tf{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    any_tf = " + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    per AS (SELECT doc_id, len(w) AS dl, {tfs} FROM toks),
    stats AS (
      SELECT COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(dl AS DECIMAL(38,10))) AS DOUBLE)
                   / COUNT(dl), 4) AS avgdl,
             {dfs}
      FROM per
    )
    SELECT doc_id, ROUND({score}, 4) AS score
    FROM per, stats
    WHERE {any_tf} > 0
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """


@register(
    "bm25_keyword_search",
    _bm25_sql(),
    note="BM25 keyword retrieval (k1=1.2, b=0.75) — the lexical leg a "
    "hybrid search pairs with the vector leg: per-doc term frequencies "
    "and length from one codegen projection, corpus stats (N, decimal-"
    "exact avgdl, per-term document frequencies) from ONE tiny aggregate "
    "broadcast back, top-k via TakeOrdered. Two scans total, no explode, "
    "no shuffle beyond the stats aggregate — at 100 TB the stats side is "
    "an index-build artifact and scoring is a single map over the scan.",
)
def q_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sortify_spark.functions.numeric import _DEC

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))

    def tf(term: str):
        # NB: a two-arg lambda in F.filter means (element, index) — the
        # closure keeps the term a plain literal.
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = F.broadcast(
        per.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("dl").cast(_DEC)).cast("double") / F.count("dl"), 4
            ).alias("avgdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
                for i in range(len(_BM25_TERMS))
            ],
        )
    )
    k1, b = _BM25_K1, _BM25_B
    parts = [
        F.log(
            (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1
        )
        * F.col(f"tf{i}")
        * (k1 + 1)
        / (
            F.col(f"tf{i}")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        for i in range(len(_BM25_TERMS))
    ]
    score = F.round(sum(parts[1:], parts[0]), 4)
    any_tf = sum(
        (F.col(f"tf{i}") for i in range(1, len(_BM25_TERMS))), F.col("tf0")
    )
    return (
        per.crossJoin(stats)
        .filter(any_tf > 0)
        .select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )
