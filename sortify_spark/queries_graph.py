"""Duplicate-graph resolution queries: pairwise near-dup output turned
into actual dedup *decisions* — connected components, component-based
keep-one resolution, and incremental batch-vs-corpus dedup.

These are the operations a training-data pipeline runs after LSH pair
finding (the reference stops at per-pair similarity:
``backend/app/services/clustering_service.py`` clusters embeddings but
never resolves duplicate graphs).  All three queries are oracle-checked;
the component oracle is a DuckDB ``WITH RECURSIVE`` reachability closure
generated from the SAME MinHash constants as the engine side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark import dedup
from sortify_spark.queries import register, _t
from sortify_spark import textstats as ts

#: Same knobs as the flagship ``minhash_lsh_pairs`` query / the
#: ``corpus_curation`` stage — 3-shingles, Jaccard ≥ 0.5.
_SHINGLE_K = 3
_THRESHOLD = 0.5

_PAIRS_SQL = dedup.minhash_lsh_oracle_sql(
    threshold=_THRESHOLD, shingle_k=_SHINGLE_K
)


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=_THRESHOLD,
        use_shingles=_SHINGLE_K,
    )


@register(
    "neardup_components",
    f"""
    WITH comp AS ({dedup.components_oracle_sql(_PAIRS_SQL)})
    SELECT comp AS component, COUNT(*) AS size
    FROM comp GROUP BY comp ORDER BY size DESC, component
    """,
    note="Connected components over the MinHash-LSH duplicate graph "
    "(alternating min-propagation + pointer jumping, O(log diameter) "
    "iterations of two equi-join shuffles over one-row-per-node label "
    "state). Oracle: recursive reachability closure in DuckDB from the "
    "same hash constants. The transitive closure is what makes pairwise "
    "near-dup output an actual dedup decision.",
)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup.connected_components(_pairs(spark, sf_dir))
    return (
        comp.groupBy(F.col("comp").alias("component"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), F.asc("component"))
    )


@register(
    "dedup_keep_component_rep",
    f"""
    WITH comp AS ({dedup.components_oracle_sql(_PAIRS_SQL)})
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> comp)
    ORDER BY doc_id
    """,
    note="Near-dup resolution via components: keep exactly the min-id "
    "representative of every duplicate cluster (transitively closed), "
    "drop the rest. Per-pair drop-the-b heuristics can both over- and "
    "under-drop on chains A~B~C. The drop set (non-representative "
    "members) is tiny relative to the corpus, so the final anti-join "
    "broadcasts it — the corpus never shuffles.",
)
def q_dedup_keep_component_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    comp = dedup.connected_components(_pairs(spark, sf_dir))
    drops = comp.filter(F.col("node") != F.col("comp")).select("node")
    return (
        docs.join(F.broadcast(drops), docs.doc_id == drops.node, "left_anti")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


_FP = ts.FINGERPRINT_SQL.format(t="text")


@register(
    "incremental_dedup_new_docs",
    f"""
    WITH pairs AS ({_PAIRS_SQL}),
    near_hit AS (
      SELECT id_a AS bid FROM pairs
      WHERE id_a % 10 = 7 AND id_b % 10 <> 7
      UNION
      SELECT id_b AS bid FROM pairs
      WHERE id_b % 10 = 7 AND id_a % 10 <> 7
    ),
    exact_hit AS (
      SELECT b.doc_id AS bid
      FROM documents b JOIN documents c
        ON {_FP.replace('text', 'b.text')} = {_FP.replace('text', 'c.text')}
      WHERE b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
    )
    SELECT doc_id, source FROM documents
    WHERE doc_id % 10 = 7
      AND doc_id NOT IN (SELECT bid FROM near_hit)
      AND doc_id NOT IN (SELECT bid FROM exact_hit)
    ORDER BY doc_id
    """,
    note="Incremental ingestion dedup: an incoming batch (doc_id%10=7 "
    "simulates the delta) is admitted only if no exact-fingerprint twin "
    "AND no verified near-dup (shared LSH band + Jaccard >= 0.5) exists "
    "in the standing corpus. Engine side joins batch bands against "
    "corpus bands (batch side is small → cheap bucket join; at scale "
    "the corpus signatures are precomputed once and reused per batch). "
    "Oracle expresses the same semantics via the full pair closure "
    "restricted to batch-corpus crossing pairs — identical candidate "
    "sets because banding is per-doc deterministic.",
)
def q_incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 7
    batch = docs.filter(is_batch)
    corpus = docs.filter(~is_batch)

    # Exact twin in corpus: fingerprint semi-join (batch side tiny).
    fp = ts.fingerprint(F.col("text"))
    bfp = batch.select("doc_id", "source", fp.alias("fp"))
    cfp = corpus.select(fp.alias("fp")).dropDuplicates(["fp"])
    exact_clean = bfp.join(cfp, "fp", "left_anti")

    # Near-dup vs corpus: identical banding on both sides via the shared
    # signature front half, then batch-bands ⋈ corpus-bands bucket join,
    # exact Jaccard verify on the candidates only.
    b_base, b_bands = dedup.signature_bands(
        batch, use_shingles=_SHINGLE_K
    )
    c_base, c_bands = dedup.signature_bands(
        corpus, use_shingles=_SHINGLE_K
    )
    cand = (
        b_bands.select(F.col("id").alias("bid"), "band_idx", "band_key")
        .join(
            c_bands.select(F.col("id").alias("cid"), "band_idx", "band_key"),
            ["band_idx", "band_key"],
        )
        .select("bid", "cid")
        .dropDuplicates(["bid", "cid"])
    )
    verified = (
        cand.join(b_base.select(F.col("id").alias("bid"), F.col("toks").alias("toks_b")), "bid")
        .join(c_base.select(F.col("id").alias("cid"), F.col("toks").alias("toks_c")), "cid")
        .filter(
            F.round(dedup.jaccard(F.col("toks_b"), F.col("toks_c")), 6)
            >= _THRESHOLD
        )
        .select(F.col("bid").alias("doc_id"))
        .dropDuplicates(["doc_id"])
    )
    return (
        exact_clean.join(F.broadcast(verified), "doc_id", "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split
# ---------------------------------------------------------------------------

#: Component-level split buckets: md5(comp) % 10 -> 0-7 train, 8 val,
#: 9 test.  Assigning at COMPONENT granularity is the whole point: a
#: near-dup pair split across train and test leaks evaluation data into
#: training (the failure Lee et al. 2021 and the GPT-3 appendix both
#: document); hashing the component id makes that impossible by
#: construction, and the in-plan audit proves it.
_SPLIT_BUCKETS = 10
_SPLIT_VAL_BKT = 8
_SPLIT_TEST_BKT = 9


def _split_case_sql(bkt: str) -> str:
    return (
        f"CASE WHEN {bkt} = {_SPLIT_VAL_BKT} THEN 'val' "
        f"WHEN {bkt} = {_SPLIT_TEST_BKT} THEN 'test' "
        "ELSE 'train' END"
    )


@register(
    "leakage_safe_split",
    f"""
    WITH pairs AS ({_PAIRS_SQL}),
    comp AS ({dedup.components_oracle_sql(_PAIRS_SQL)}),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS comp
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    s AS (
      SELECT doc_id, comp,
             {_split_case_sql(
                 "('0x' || substring(md5(CAST(comp AS VARCHAR)), 1, 7))"
                 f"::BIGINT % {_SPLIT_BUCKETS}"
             )} AS split
      FROM labeled
    ),
    v AS (
      SELECT COUNT(*) AS cross_split_pairs
      FROM pairs p
      JOIN s sa ON sa.doc_id = p.id_a
      JOIN s sb ON sb.doc_id = p.id_b
      WHERE sa.split <> sb.split
    )
    SELECT split, COUNT(*) AS docs, COUNT(DISTINCT comp) AS components,
           (SELECT cross_split_pairs FROM v) AS cross_split_pairs
    FROM s GROUP BY split ORDER BY split
    """,
    note="Leakage-safe corpus split: near-dup components (the SAME "
    "closure as neardup_components) are assigned to train/val/test "
    "ATOMICALLY via the portable md5 bucket of the component id — a "
    "near-dup pair can never straddle splits, so eval never sees a "
    "paraphrase of training data.  The cross-split pair audit is "
    "computed IN the plan (two joins of the pair set against the "
    "label map) and must be 0 — proven, not assumed.  Singletons hash "
    "on their own id; the corpus never shuffles except the doc_id "
    "equi-join against the (tiny) component map.",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    pairs = _pairs(spark, sf_dir)
    comp = dedup.connected_components(pairs)
    labeled = docs.join(
        F.broadcast(comp), docs.doc_id == comp.node, "left"
    ).select(
        "doc_id", F.coalesce("comp", "doc_id").alias("comp")
    )
    from sortify_spark.operators.sampling import hash_bucket

    bkt = hash_bucket("comp", _SPLIT_BUCKETS)
    s = labeled.withColumn(
        "split",
        F.when(bkt == _SPLIT_VAL_BKT, F.lit("val"))
        .when(bkt == _SPLIT_TEST_BKT, F.lit("test"))
        .otherwise(F.lit("train")),
    )
    viol = (
        pairs.join(
            s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")),
            "id_a",
        )
        .join(
            s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).alias("cross_split_pairs"))
    )
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("comp").alias("components"),
        )
        .crossJoin(F.broadcast(viol))
        .orderBy("split")
    )
