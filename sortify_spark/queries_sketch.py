"""Fixed-memory sketch operators: count-min heavy-hitter audit, a
Bloom-filter pre-filter join, and DSIR hashed-n-gram importance weights.

Three published techniques whose whole point is the 100-TB regime —
each replaces an exact, shuffle-heavy structure with a deterministic
fixed-size summary that broadcasts:

- **Count-min sketch** (Cormode & Muthukrishnan, "An Improved Data
  Stream Summary: The Count-Min Sketch and its Applications", J.
  Algorithms 2005): a ``DEPTH x WIDTH`` counter grid; every word
  increments one bucket per row, point estimates take the min across
  rows — never an underestimate.  The sketch is a few KB regardless of
  vocabulary size, and builds map-side-combined (``groupBy(d, bucket)``
  partial sums), so the full-vocab shuffle of an exact top-k
  disappears.  Our query audits the sketch against the exact counts:
  estimates for the true top-``CMS_TOPK`` words with their
  overestimates (≥ 0 by construction, a checkable invariant).
- **Bloom pre-filter join** (Bloom, "Space/Time Trade-offs in Hash
  Coding with Allowable Errors", CACM 1970): the small side of a
  semi-join distills into an ``m``-bit array (k md5-derived hashes,
  bit_or-aggregated into 32-bit words); the big side probes the
  broadcast bitset and only surviving rows reach the exact join.  No
  false negatives — every true match passes — so correctness lives in
  the exact join and the bitset only sheds rows early.  This is
  Spark's own runtime-filter idea surfaced as an explicit, replayable
  operator.  The query reports, per order priority, probe volume,
  bloom passes, true matches, and false positives.
- **DSIR importance weights** (Xie et al., "Data Selection for
  Language Models via Importance Resampling", NeurIPS 2023): hashed
  n-gram features (md5 bucket of each word, ``DSIR_BUCKETS`` cells)
  give two multinomial distributions — the target slice (here: the
  ``lang='en'`` documents, the stand-in for "formal text") and the
  raw corpus.  Each document's importance weight is the mean
  target/raw probability ratio of its tokens (add-one smoothing).
  Following the repo's no-transcendentals contract (see
  ``queries_lm``), the weight is a mean of per-bucket probability
  RATIOS — three single IEEE divisions on exact integers, each
  rounded, then DECIMAL-accumulated — rather than the paper's sum of
  log ratios: same ordering, bit-identical in both engines.  Docs at
  or above the corpus-mean weight are the "kept" resample proxy
  (sampling ∝ weight needs RNG; the deterministic relative cut is the
  hash-checkable twin, same idiom as ``bigram_lm_quality``).

Scale shape: all three summaries (1 KB sketch, 128-word bitset,
512-row ratio table) are ``F.broadcast``-tagged, so the corpus token
stream / order stream is never shuffled — explode → broadcast hash
join → map-side-combined agg; the only exchanges carry per-doc or
per-group rows.

Reference anchors (what these generalize, NOT ports): keyword
frequency counting `clustering_service.py:833-865` (CMS is its
fixed-memory shape), batch id-membership lookups
`crud_documents.py:319-357` (Bloom is the scale pre-screen), and the
rule-based quality surface (DSIR is the distribution-matching
upgrade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.queries import register, _t

CMS_DEPTH = 4  #: hash rows (P[overestimate] decays per row)
CMS_WIDTH = 256  #: buckets per row (error ∝ total_count / width)
CMS_TOPK = 20  #: audited heavy hitters

BLOOM_BITS = 4096  #: m — bitset size (128 x 32-bit words)
BLOOM_K = 3  #: hash functions per key
BLOOM_SEGMENT = "BUILDING"  #: small-side key set: customers in segment

DSIR_BUCKETS = 512  #: hashed-feature space for both distributions
_DEC = "decimal(38,12)"


def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


def _md5_long(col) -> F.Column:
    """First 8 md5 hex digits of a string column as a bigint — the
    repo-wide portable hash (same bits as DuckDB's
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def countmin_word_counts(docs: DataFrame) -> DataFrame:
    """Build a ``CMS_DEPTH x CMS_WIDTH`` count-min sketch over the word
    stream and audit it: exact vs estimated counts for the true
    top-``CMS_TOPK`` words (overestimate ≥ 0 by construction)."""
    # wc feeds BOTH the sketch build and the exact top-k — one
    # materialization instead of two tokenize+aggregate passes (blocks
    # freed by the context cleaner).  A scan fan-out was measured here
    # and REJECTED: the per-partition partial aggregate dedups the
    # vocabulary far better from one partition (0.65 s → 0.87 s
    # alternating A/B).
    wc = (
        docs.select(F.explode(_words()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    depths = F.explode(
        F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
    ).alias("d")
    salted = F.concat(F.col("d").cast("string"), F.lit("#"), F.col("w"))
    cells = (
        wc.select("w", "c", depths)
        .withColumn("bucket", _md5_long(salted) % CMS_WIDTH)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("cell"))
    )
    top = wc.orderBy(F.desc("c"), F.asc("w")).limit(CMS_TOPK)
    probed = (
        top.select("w", "c", depths)
        .withColumn("bucket", _md5_long(salted) % CMS_WIDTH)
        .join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("w", "c")
        .agg(F.min("cell").alias("est"))
    )
    return probed.select(
        F.col("w").alias("word"),
        F.col("c").alias("exact_cnt"),
        F.col("est").alias("cms_est"),
        (F.col("est") - F.col("c")).alias("overest"),
    ).orderBy(F.desc("exact_cnt"), F.asc("word"))


_CMS_HASH = (
    "(('0x' || substr(md5(CAST({d} AS VARCHAR) || '#' || {w}), 1, 8))"
    f"::BIGINT % {CMS_WIDTH})"
)

_CMS_SQL = f"""
WITH w0 AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
         AS w
  FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM w0 GROUP BY w),
d AS (SELECT unnest(range(0, {CMS_DEPTH})) AS d),
cells AS (
  SELECT d.d, {_CMS_HASH.format(d='d.d', w='wc.w')} AS bucket,
         SUM(wc.c) AS cell
  FROM wc CROSS JOIN d GROUP BY 1, 2
),
top AS (SELECT w, c FROM wc ORDER BY c DESC, w ASC LIMIT {CMS_TOPK}),
probed AS (
  SELECT top.w, top.c, MIN(cells.cell) AS est
  FROM top CROSS JOIN d
  JOIN cells ON cells.d = d.d
   AND cells.bucket = {_CMS_HASH.format(d='d.d', w='top.w')}
  GROUP BY 1, 2
)
SELECT w AS word, c AS exact_cnt, est AS cms_est, est - c AS overest
FROM probed ORDER BY exact_cnt DESC, word ASC
"""


@register(
    "countmin_word_counts",
    _CMS_SQL,
    note=f"Count-min sketch ({CMS_DEPTH}x{CMS_WIDTH}, md5-salted rows) "
    "over the corpus word stream, audited against exact counts for the "
    f"true top-{CMS_TOPK} words: estimate = min across rows, "
    "overestimate >= 0 by construction.  The sketch builds "
    "map-side-combined and is a few KB regardless of vocabulary — the "
    "fixed-memory shape of heavy-hitter counting at 100 TB "
    "(Cormode & Muthukrishnan 2005).",
)
def q_countmin_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return countmin_word_counts(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Bloom-filter pre-filter join
# ---------------------------------------------------------------------------


def bloom_prefilter_join(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Per order priority: probe volume, Bloom passes, true semi-join
    matches, and false positives when orders are pre-screened against a
    ``BLOOM_BITS``-bit filter of the ``BLOOM_SEGMENT`` customer keys."""
    keys = customer.filter(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    ).select(F.col("c_custkey").alias("k"))

    def _h(key_col: str, j) -> F.Column:
        # j may be a column (build side) or an int literal (probe side);
        # both render the same "j:key" salt string.
        jcol = j if isinstance(j, Column) else F.lit(str(j))
        salted = F.concat(
            jcol.cast("string"), F.lit(":"), F.col(key_col).cast("string")
        )
        return _md5_long(salted) % BLOOM_BITS

    bitset = (
        keys.select(
            "k",
            F.explode(
                F.sequence(F.lit(0), F.lit(BLOOM_K - 1))
            ).alias("j"),
        )
        .withColumn("h", _h("k", F.col("j")))
        .select(
            F.expr("h DIV 32").alias("word"),
            F.expr("shiftleft(1L, CAST(h % 32 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    # Probe without exploding the big side: one column triple per hash,
    # one broadcast join per hash — the order stream is never shuffled
    # (the only exchange carries the 5 per-priority groups, map-side
    # combined).
    from sortify_spark.operators.partitioning import fan_out

    # the per-row md5 probes (BLOOM_K per order) run in the scan stage —
    # fan the small single-file order scan out first (cluster no-op);
    # all downstream aggregates are exact integers, so the partitioning
    # change cannot move a bit
    pr = fan_out(orders).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    hit_cols = []
    for j in range(BLOOM_K):
        pr = pr.withColumn(f"h{j}", _h("o_custkey", j))
        pr = pr.withColumn(f"word{j}", F.expr(f"h{j} DIV 32"))
        pr = pr.withColumn(
            f"mask{j}", F.expr(f"shiftleft(1L, CAST(h{j} % 32 AS INT))")
        )
        bs = bitset.select(
            F.col("word").alias(f"word{j}"), F.col("bits").alias(f"bits{j}")
        )
        pr = pr.join(F.broadcast(bs), [f"word{j}"], "left")
        hit_cols.append(
            (
                F.coalesce(F.col(f"bits{j}"), F.lit(0)).bitwiseAND(
                    F.col(f"mask{j}")
                )
            )
            != 0
        )
    passed = hit_cols[0]
    for c in hit_cols[1:]:
        passed = passed & c
    flagged = pr.join(
        F.broadcast(keys.distinct()),
        pr["o_custkey"] == F.col("k"),
        "left",
    ).select(
        "o_orderpriority",
        F.when(passed, 1).otherwise(0).alias("passed"),
        F.when(F.col("k").isNull(), 0).otherwise(1).alias("is_true"),
    )
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("orders_total"),
            F.sum("passed").alias("bloom_pass"),
            F.sum("is_true").alias("true_match"),
            F.sum(
                F.when(
                    (F.col("passed") == 1) & (F.col("is_true") == 0), 1
                ).otherwise(0)
            ).alias("false_pos"),
        )
        .orderBy("o_orderpriority")
    )


_BLOOM_HASH = (
    "(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || "
    "CAST({k} AS VARCHAR)), 1, 8))::BIGINT % "
    f"{BLOOM_BITS})"
)

_BLOOM_SQL = f"""
WITH keys AS (
  SELECT c_custkey AS k FROM customer
  WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
j AS (SELECT unnest(range(0, {BLOOM_K})) AS j),
bitset AS (
  SELECT h // 32 AS word, bit_or(1::BIGINT << (h % 32)) AS bits
  FROM (
    SELECT {_BLOOM_HASH.format(k='keys.k')} AS h
    FROM keys CROSS JOIN j
  ) kb
  GROUP BY 1
),
probes AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         SUM(CASE WHEN (COALESCE(b.bits, 0)
                        & (1::BIGINT << (ph.h % 32))) <> 0
             THEN 1 ELSE 0 END) AS hits
  FROM (
    SELECT o_orderkey, o_custkey, o_orderpriority,
           {_BLOOM_HASH.format(k='o_custkey')} AS h
    FROM orders CROSS JOIN j
  ) ph
  LEFT JOIN bitset b ON b.word = ph.h // 32
  GROUP BY 1, 2, 3
),
flagged AS (
  SELECT probes.o_orderpriority, probes.hits,
         CASE WHEN dk.k IS NULL THEN 0 ELSE 1 END AS is_true
  FROM probes
  LEFT JOIN (SELECT DISTINCT k FROM keys) dk ON probes.o_custkey = dk.k
)
SELECT o_orderpriority, COUNT(*) AS orders_total,
       SUM(CASE WHEN hits = {BLOOM_K} THEN 1 ELSE 0 END) AS bloom_pass,
       SUM(is_true) AS true_match,
       SUM(CASE WHEN hits = {BLOOM_K} AND is_true = 0
           THEN 1 ELSE 0 END) AS false_pos
FROM flagged GROUP BY 1 ORDER BY 1
"""


@register(
    "bloom_prefilter_join",
    _BLOOM_SQL,
    note=f"Bloom-filter pre-filter join: the {BLOOM_SEGMENT}-segment "
    f"customer keys distill into a {BLOOM_BITS}-bit filter ({BLOOM_K} "
    "md5 hashes, bit_or-packed 32-bit words) that the order stream "
    "probes BEFORE the exact semi-join — no false negatives, so the "
    "bitset only sheds rows early; per-priority probe volume, passes, "
    "true matches, and false positives audited (Bloom 1970; Spark's "
    "runtime-filter idea as an explicit replayable operator).",
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_prefilter_join(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance weights
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"  #: target-distribution slice (formal-text proxy)


def _dsir_per_doc(docs: DataFrame) -> DataFrame:
    """The scoring subtree: per-doc importance weight + token count
    (pre-checkpoint, so the plan-shape test can assert the broadcast
    discipline).  See :func:`dsir_importance_weights` for the r13
    pass-shape rationale."""
    from sortify_spark.operators.partitioning import fan_out

    toks = fan_out(docs).select(
        "doc_id",
        "source",
        "lang",
        F.explode(_words()).alias("w"),
    ).withColumn("b", _md5_long(F.col("w")) % DSIR_BUCKETS)
    dbc = (
        toks.groupBy("doc_id", "source", "lang", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    bstats = dbc.groupBy("b").agg(
        F.sum(
            F.when(
                F.col("lang") == DSIR_TARGET_LANG, F.col("cnt")
            ).otherwise(0)
        ).alias("c_t"),
        F.sum("cnt").alias("c_r"),
    )
    tot = bstats.agg(
        F.sum("c_t").alias("tot_t"), F.sum("c_r").alias("tot_r")
    )
    ratio = (
        bstats.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.round(
                    (F.col("c_t") + 1).cast("double")
                    / (F.col("tot_t") + DSIR_BUCKETS).cast("double"),
                    12,
                )
                / F.round(
                    (F.col("c_r") + 1).cast("double")
                    / (F.col("tot_r") + DSIR_BUCKETS).cast("double"),
                    12,
                ),
                12,
            ).alias("r"),
        )
    )
    return (
        dbc.join(F.broadcast(ratio), ["b"])
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.sum(
                    F.col("r").cast("decimal(24,12)")
                    * F.col("cnt").cast("decimal(10,0)")
                ).cast("double")
                / F.sum("cnt"),
                9,
            ).alias("wgt"),
            F.sum("cnt").alias("n_toks"),
        )
    )


def dsir_importance_weights(docs: DataFrame) -> DataFrame:
    """Per source: docs scored, mean importance weight, docs/tokens at
    or above the corpus-mean weight (the deterministic resample
    proxy).

    Shuffle/pass shape (r13 rewrite): the old plan evaluated the
    interpreted tokenize+md5 kernel FOUR times (the c_t, c_r, tot
    branches and the per-doc probe) and the per-doc frame twice (gmean
    + final).  Now ONE token pass builds a compact per-(doc, bucket)
    count frame (materialized; blocks freed by the context cleaner);
    bucket stats, totals, AND the per-doc weights all derive from it.
    Values are bit-identical: c_t/c_r/tot are the same exact integers,
    and the per-doc DECIMAL token sum ``Σ r`` becomes ``Σ cnt·r`` with
    r in DECIMAL(24,12) × cnt in DECIMAL(10,0) → DECIMAL(35,12), an
    EXACT product (no precision-loss rescale), so the decimal
    accumulator holds the identical value."""
    per_doc = _dsir_per_doc(docs).localCheckpoint(eager=False)
    gmean = per_doc.agg(
        F.round(
            F.sum(F.col("wgt").cast(_DEC)).cast("double")
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
                F.sum(F.col("wgt").cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_w"),
            F.sum(
                F.when(F.col("wgt") >= F.col("gmean"), 1).otherwise(0)
            ).alias("kept_docs"),
            F.sum(
                F.when(F.col("wgt") >= F.col("gmean"), F.col("n_toks"))
                .otherwise(0)
            ).alias("kept_tokens"),
        )
        .orderBy("source")
    )


_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, lang,
         (('0x' || substr(md5(w), 1, 8))::BIGINT % {DSIR_BUCKETS}) AS b
  FROM (
    SELECT doc_id, source, lang,
           unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS w
    FROM documents
  ) w0
),
ct AS (
  SELECT b, COUNT(*) AS c_t FROM toks
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
),
cr AS (SELECT b, COUNT(*) AS c_r FROM toks GROUP BY b),
tot AS (
  SELECT SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
             AS tot_t,
         COUNT(*) AS tot_r
  FROM toks
),
ratio AS (
  SELECT cr.b,
         ROUND(
           ROUND(CAST(COALESCE(ct.c_t, 0) + 1 AS DOUBLE)
                 / CAST(tot.tot_t + {DSIR_BUCKETS} AS DOUBLE), 12)
           / ROUND(CAST(cr.c_r + 1 AS DOUBLE)
                   / CAST(tot.tot_r + {DSIR_BUCKETS} AS DOUBLE), 12),
           12) AS r
  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
),
per_doc AS (
  SELECT toks.doc_id, toks.source,
         ROUND(CAST(SUM(CAST(ratio.r AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 9) AS wgt,
         COUNT(*) AS n_toks
  FROM toks JOIN ratio ON toks.b = ratio.b
  GROUP BY 1, 2
),
g AS (
  SELECT ROUND(CAST(SUM(CAST(wgt AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 9) AS gmean
  FROM per_doc
)
SELECT source, COUNT(*) AS docs,
       ROUND(CAST(SUM(CAST(wgt AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mean_w,
       SUM(CASE WHEN wgt >= g.gmean THEN 1 ELSE 0 END) AS kept_docs,
       SUM(CASE WHEN wgt >= g.gmean THEN n_toks ELSE 0 END)
           AS kept_tokens
FROM per_doc, g
GROUP BY source
ORDER BY source
"""


@register(
    "dsir_importance_weights",
    _DSIR_SQL,
    note="DSIR importance weights (Xie et al., NeurIPS 2023): hashed "
    f"unigram features ({DSIR_BUCKETS} md5 buckets) give target "
    f"(lang='{DSIR_TARGET_LANG}') and raw multinomials; each doc's "
    "weight is the mean target/raw probability ratio of its tokens "
    "(add-one smoothing, single IEEE divisions + DECIMAL accumulation "
    "— no transcendentals, bit-identical engines).  Docs at/above the "
    "corpus mean are the deterministic resample proxy.  Ratio table "
    "broadcast: the token stream never shuffles.",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_importance_weights(_t(spark, sf_dir, "documents"))
