"""BPE vocabulary induction over the corpus — the trainer, not just the
tokenizer.

``token_counts_bpe`` (queries_text) counts tokens with a FIXED
BPE-ish regex; this module learns the merge table itself, the way real
BPE trainers do (Sennrich et al. 2016; HuggingFace tokenizers): the
only corpus-scale pass builds the word-frequency table, and every merge
iteration runs on that compact (distinct word, count) table — at 100 TB
the wf table is millions of rows where the corpus is billions, so the
iterative part never touches the corpus again.

Merge semantics (the deterministic contract both engines share):
words are split to characters plus an end-of-word marker ``_``; each
iteration counts adjacent symbol pairs weighted by word count
(map-side-combined explode over the wf table), picks the argmax with
(count DESC, pair ASC) tie-break, and rewrites every word's symbol
string with a single left-to-right non-overlapping ``replace`` of the
space-delimited pair.  On runs of a repeated pair, an occurrence that
shares its leading delimiter with the previous match is skipped (the
match consumed it) — a documented divergence from HF's run handling,
identical in Spark and DuckDB because both ``replace`` implementations
scan left-to-right without overlap; pinned by
``tests/test_text_ops.py::test_bpe_merge_semantics``.

The argmax never leaves the plan: the 1-row best-pair aggregate is
broadcast back into the rewrite via crossJoin, so K merges are K
plan iterations with zero driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sortify_spark.queries import register, _t

N_MERGES = 6  #: merge steps to learn
EOW = "_"  #: end-of-word marker symbol


def _wf(docs: DataFrame) -> DataFrame:
    """Distinct-word frequency table with the initial symbol string —
    the ONE corpus-scale pass."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("word")
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return wf.withColumn(
        "sym",
        F.concat(F.array_join(chars, " "), F.lit(" " + EOW)),
    )


def _pair_counts(cur: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency.

    Words whose symbol string has collapsed to a single symbol (fully
    merged within the step budget) contribute no adjacent pairs and are
    filtered out BEFORE the explode: ``sequence(1, size-1)`` with
    size==1 would otherwise produce a descending ``[1, 0]`` (Spark
    defaults the step to -1) and ``element_at(a, 0)`` throws.  The
    DuckDB oracle's ``range(1, 1)`` is empty for the same row, so the
    filter is also the semantics both engines share.
    """
    a = F.split(F.col("sym"), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(a) - 1),
        lambda i: F.concat(
            F.element_at(a, i), F.lit(" "), F.element_at(a, i + 1)
        ),
    )
    return (
        cur.filter(F.size(a) >= 2)
        .select("cnt", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pcnt"))
    )


def _train(docs: DataFrame, n_merges: int, need_final: bool = True):
    """Shared trainer loop — returns (per-step best frames, final
    word→symbol state).  The final state IS the tokenizer: each word's
    ``sym`` column is its BPE segmentation under the learned merges.

    Lineage + cache discipline: each iteration's state references the
    previous one TWICE (directly, and inside the broadcast-argmax
    subtree), so a naive chain of K merges builds a 2^K logical tree —
    plan-string generation alone OOMs a default-sized driver.  The
    compact per-iteration state (distinct words + symbol strings — the
    table real trainers materialize) is therefore
    ``localCheckpoint(eager=True)``-ed each step: the plan is truncated
    to the materialized blocks (constant depth), and the previous
    iteration's blocks are released by the context cleaner once
    unreferenced — repeated invocations no longer accumulate K+1
    wf-table copies in executor storage.  The per-step argmax is a
    1-row checkpointed frame, so the merge frames stay readable after
    their source iteration is gone; its eager count also detects
    convergence: when every word has fully merged the pair table is
    empty and the loop stops instead of cross-joining an empty best
    frame (which would erase the state).  ``need_final=False`` skips
    the last rewrite entirely (the merge list doesn't need it).
    """
    cur = _wf(docs).localCheckpoint(eager=True)
    merges = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(cur)
            .orderBy(F.desc("pcnt"), F.asc("pair"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if best.count() == 0:  # converged: no adjacent pairs anywhere
            break
        merges.append(
            best.select(
                F.lit(step).alias("step"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias(
                    "merged"
                ),
                "pcnt",
            )
        )
        if step == n_merges and not need_final:
            break
        bp = F.broadcast(best.select(F.col("pair").alias("__bp")))
        nxt = (
            cur.crossJoin(bp)
            .withColumn(
                "sym",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                        F.concat(F.lit(" "), F.col("__bp"), F.lit(" ")),
                        F.concat(
                            F.lit(" "),
                            F.replace(
                                F.col("__bp"), F.lit(" "), F.lit("")
                            ),
                            F.lit(" "),
                        ),
                    )
                ),
            )
            .drop("__bp")
            .localCheckpoint(eager=True)
        )
        cur = nxt
    if not need_final:
        cur = None
    return merges, cur


def train_bpe_merges(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns
    (step, pair, merged, pcnt) ordered by step."""
    merges, _ = _train(docs, n_merges, need_final=False)
    if not merges:  # converged before the first merge (degenerate corpus)
        return docs.sparkSession.createDataFrame(
            [], "step int, pair string, merged string, pcnt bigint"
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("step")


def bpe_token_stats(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Apply the learned vocabulary back to the corpus: per source,
    word occurrences, the character-level token baseline
    (chars + end-of-word), the BPE token count under the learned
    merges, and the compression ratio.

    The tokenizer is the trainer's final word→symbol state — applying
    it is one equi-join of the corpus word stream to the compact
    per-word token counts (vocab side broadcast at this scale, a plain
    shuffle join once the vocab outgrows it), then one
    map-side-combined aggregate per source."""
    _, cur = _train(docs, n_merges)
    wtok = cur.select(
        "word", F.size(F.split(F.col("sym"), " ")).alias("ntok")
    )
    wx = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("word"),
    )
    return (
        wx.join(wtok, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("words"),
            F.sum(F.length("word") + 1).alias("char_tokens"),
            F.sum("ntok").alias("bpe_tokens"),
            F.round(
                F.sum("ntok").cast("double")
                / F.sum(F.length("word") + 1),
                6,
            ).alias("compression"),
        )
        .orderBy("source")
    )


def _bpe_ctes(n_merges: int) -> list[str]:
    """Unrolled DuckDB CTE chain replaying the trainer loop — one pair
    (best_k, it_k) per merge step, generated from the same constants."""
    sym0 = (
        "array_to_string(list_transform(range(1, len(word) + 1), "
        f"i -> word[i]), ' ') || ' {EOW}'"
    )
    parts = [
        f"""it0 AS (
  SELECT word, cnt, {sym0} AS sym FROM (
    SELECT word, COUNT(*) AS cnt FROM (
      SELECT unnest(list_filter(string_split(text, ' '),
                                x -> x <> '')) AS word
      FROM documents) GROUP BY word)
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""b{k} AS (
  SELECT pair, SUM(cnt) AS pcnt FROM (
    SELECT cnt, unnest(list_transform(range(1, len(a)),
                       i -> a[i] || ' ' || a[i+1])) AS pair
    FROM (SELECT cnt, string_split(sym, ' ') AS a FROM it{k - 1}))
  GROUP BY pair ORDER BY pcnt DESC, pair ASC LIMIT 1
)"""
        )
        # COALESCE to a chr(1) sentinel (never occurs in sym) makes the
        # rewrite an identity when b{k} is empty — i.e. the trainer has
        # converged — matching the engine's convergence break instead
        # of NULLing every symbol string.
        parts.append(
            f"""it{k} AS (
  SELECT word, cnt,
         trim(replace(' ' || sym || ' ',
                      COALESCE((SELECT ' ' || pair || ' ' FROM b{k}),
                               chr(1)),
                      COALESCE((SELECT ' ' || replace(pair, ' ', '')
                                || ' ' FROM b{k}), chr(1)))) AS sym
  FROM it{k - 1}
)"""
        )
    return parts


def _bpe_oracle_sql(n_merges: int = N_MERGES) -> str:
    parts = _bpe_ctes(n_merges)
    selects = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, pair, replace(pair, ' ', '') AS merged, "
        f"pcnt FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + f"\n{selects}\nORDER BY step"
    )


def _bpe_apply_oracle_sql(n_merges: int = N_MERGES) -> str:
    parts = _bpe_ctes(n_merges)
    parts.append(
        f"""wt AS (
  SELECT word, len(string_split(sym, ' ')) AS ntok FROM it{n_merges}
)"""
    )
    parts.append(
        """wx AS (
  SELECT source, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS word
  FROM documents
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT source, COUNT(*) AS words,
       SUM(len(word) + 1) AS char_tokens,
       SUM(ntok) AS bpe_tokens,
       ROUND(CAST(SUM(ntok) AS DOUBLE) / SUM(len(word) + 1), 6)
           AS compression
FROM wx JOIN wt USING (word)
GROUP BY source ORDER BY source"""
    )


@register(
    "bpe_train_merges",
    _bpe_oracle_sql(),
    note=f"BPE trainer: first {N_MERGES} merges learned from the corpus "
    "word-frequency table (the only corpus-scale pass), argmax pair per "
    "step with (count DESC, pair ASC) tie-break, symbol rewrite via "
    "delimiter-guarded left-to-right replace.  The 1-row argmax is "
    "broadcast back into the plan — K merge steps, zero collects.  "
    "Oracle is the same iteration unrolled into CTEs from the same "
    "constants.",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_bpe_merges(_t(spark, sf_dir, "documents"))


@register(
    "bpe_token_stats",
    _bpe_apply_oracle_sql(),
    note="BPE tokenizer application: the trainer's final word-symbol "
    "state joins back to the corpus word stream (compact vocab side "
    "broadcast; shuffle join once it outgrows that), yielding per-"
    "source BPE token counts and the compression ratio vs the "
    "character baseline.  Oracle extends the trainer's unrolled CTEs "
    "with the same join.",
)
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_stats(_t(spark, sf_dir, "documents"))
