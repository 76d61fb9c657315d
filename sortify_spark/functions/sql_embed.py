"""SQL-replayable deterministic embedder (F7's oracle-checkable twin).

The default encoder stub (``functions/vectors.hash_embed_text``) derives
token vectors from sha1-seeded numpy RNG — deterministic, but only a
Python process can reproduce it, so every pipeline built on it is
rows-only at the driver's correctness gate.  This module provides a
second stub whose token vectors are **exact dyadic rationals computed
from md5 prefixes**:

    h(token, j) = int(md5(token || '|' || j)[:8 hex], 16) / 2^32 * 2 - 1

Both Spark (``conv(substring(md5(..)))``) and DuckDB
(``('0x' || substr(md5(..), 1, 8))::BIGINT``) produce the SAME md5 hex
and the SAME bit-exact double, and both engines fold the per-token sums
left-to-right, so document embeddings — and every cosine score computed
from them — are bit-identical across engines.  That upgrades the whole
ingest → embed → knn → fusion pipeline from "components oracle-checked"
to "the user-facing pipeline itself hash-checked" (the reference's
actual encoder, ``embedding_service.py:98-179``, remains an injected
external model either way).

As a bonus this encoder is **pure Catalyst** — whole plan JVM-side, no
Python workers, no Arrow transfer — which is also the preferred shape
for cheap structural embeddings at 100 TB.  Cost: tokens × dim md5
calls per row; keep ``dim`` modest (16 default) — it is a *structural
stand-in* for a real model, not a quality embedding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default dimension for the SQL-replayable stub (cost: dim md5 calls
#: per token per row on BOTH engines).
EXPR_EMBED_DIM = 16

#: 2^32 — the md5-prefix range; division by it is exact in IEEE double.
_SCALE = 4294967296.0


def _h(tok: Column, j: Column) -> Column:
    """Hash component h(tok, j) ∈ [-1, 1): exact dyadic rational from an
    8-hex-digit md5 prefix — bit-identical in any engine with md5."""
    hexpfx = F.substring(
        F.md5(F.concat(tok, F.lit("|"), j.cast("string"))), 1, 8
    )
    return (
        F.conv(hexpfx, 16, 10).cast("bigint").cast("double") / F.lit(_SCALE)
    ) * 2 - 1


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokens with empties dropped — identical to DuckDB's
    ``list_filter(string_split_regex(text, '\\s+'), t -> t <> '')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def expr_embed(text: Column | str, dim: int = EXPR_EMBED_DIM) -> Column:
    """L2-normalized bag-of-tokens embedding as a pure Catalyst
    expression (``array<double>``), bit-identical to :func:`embed_sql`'s
    DuckDB rendering.

    Component j = Σ_tokens h(token, j), folded left-to-right in token
    order; then divided by the L2 norm (zero-vector guard for empty
    texts).  No rounding anywhere — determinism comes from exact inputs
    plus identical fold order, not from quantization.
    """
    toks = tokens_expr(text)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + _h(t, j)
        ),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(raw, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.when(norm == 0.0, raw).otherwise(
        F.transform(raw, lambda x: x / norm)
    )


#: Vocab-map embed gate: the per-distinct-token hash table is BROADCAST
#: (one map row of ~(token + dim·8B) per entry), so it is only safe for
#: bounded vocabularies — ~100 MB at 1M entries / dim 8.  Above the cap
#: the caller falls back to the per-occurrence fold.  Deploy-tunable.
VOCAB_EMBED_MAX = 262_144


def vocab_embed_frame(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = EXPR_EMBED_DIM,
    max_vocab: int | None = None,
    carry_cols: tuple[str, ...] = (),
):
    """(id, e) embedding frame computed via a per-DISTINCT-token hash
    table instead of per-occurrence md5 folds — BIT-IDENTICAL to
    ``expr_embed`` (r14 prototype: 0 mismatching components over sf0.1;
    1.3× faster, winning every alternating block).

    Why it is exact: component j of the raw embedding is the
    left-to-right fold ``Σ_tokens h(token, j)``; here the fold runs over
    the SAME tokens in the SAME order, each term fetched from a
    broadcast ``map<token, array<double>>`` built with the SAME ``_h``
    expression — identical IEEE op sequence, only the md5 work moves
    from tokens×dim evaluations to vocab×dim (corpus vocabularies are
    Zipfian, so vocab ≪ token occurrences).

    Scale guard: the map is driver/executor-resident, so the vocabulary
    is counted first (one cheap codegen'd aggregate) and ``None`` is
    returned past ``max_vocab`` — callers keep the per-row fold as the
    unbounded-vocabulary fallback (same result either way)."""
    import os

    from pyspark.sql import functions as F

    if max_vocab is None:
        max_vocab = int(
            os.environ.get("SORTIFY_EMBED_VOCAB_MAX", str(VOCAB_EMBED_MAX))
        )
    toks = docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in carry_cols],
        tokens_expr(F.col(text_col)).alias("toks"),
    )
    distinct_toks = toks.select(F.explode("toks").alias("t")).distinct()
    if max_vocab >= 0:
        n_vocab = distinct_toks.count()
        if n_vocab > max_vocab:
            return None
    vocab = distinct_toks.select(
        "t",
        F.array(*[_h(F.col("t"), F.lit(j)) for j in range(dim)]).alias("v"),
    )
    vmap = F.broadcast(
        vocab.agg(
            F.map_from_entries(F.collect_list(F.struct("t", "v"))).alias(
                "m"
            )
        )
    )
    zeros = F.array(*[F.lit(0.0) for _ in range(dim)])
    raw = F.aggregate(
        F.col("toks"),
        zeros,
        lambda acc, t: F.zip_with(
            acc, F.element_at(F.col("m"), t), lambda x, y: x + y
        ),
    )
    j = toks.crossJoin(vmap).select("id", *carry_cols, raw.alias("raw"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("raw"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return j.select(
        "id",
        *carry_cols,
        F.when(norm == 0.0, F.col("raw"))
        .otherwise(F.transform(F.col("raw"), lambda x: x / norm))
        .alias("e"),
    )


# ---------------------------------------------------------------------------
# DuckDB renderings (the oracle side of the same math)
# ---------------------------------------------------------------------------


def h_sql(tok: str = "t", j: str = "j") -> str:
    """DuckDB rendering of :func:`_h` over lambda variables."""
    return (
        f"(('0x' || substr(md5({tok} || '|' || CAST({j} AS VARCHAR)), 1, 8))"
        f"::BIGINT / {_SCALE} * 2 - 1)"
    )


def tokens_sql(text_expr: str) -> str:
    return (
        f"list_filter(string_split_regex({text_expr}, '\\s+'), t -> t <> '')"
    )


def raw_embed_sql(toks_expr: str, dim: int = EXPR_EMBED_DIM) -> str:
    """Un-normalized embedding from a token-list expression.  list_reduce
    has no initial accumulator, so the fold is t1+t2+…, which equals
    Spark's (0.0+t1)+t2+… bit-exactly; the empty-list guard covers
    whitespace-only texts where Spark's fold returns the 0.0 seed."""
    comp = (
        f"CASE WHEN len({toks_expr}) = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"list_reduce(list_transform({toks_expr}, t -> {h_sql('t', 'j')}), "
        f"(a, b) -> a + b) END"
    )
    return f"list_transform(range(0, {dim}), j -> {comp})"


def norm_sql(arr_expr: str) -> str:
    """L2 norm with the same left-to-right fold as ``l2_norm``."""
    return (
        f"sqrt(list_reduce(list_transform({arr_expr}, x -> x * x), "
        f"(a, b) -> a + b))"
    )


def normalize_sql(raw_col: str, norm_col: str) -> str:
    return (
        f"CASE WHEN {norm_col} = 0 THEN {raw_col} "
        f"ELSE list_transform({raw_col}, x -> x / {norm_col}) END"
    )


def dot_sql(a: str, b: str, dim: int) -> str:
    """Left-to-right dot product — same order as ``functions.vectors.dot``
    (aggregate over zip_with)."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def cosine_sql(a: str, b: str, na: str, nb: str, dim: int) -> str:
    """DuckDB rendering of ``cosine_given_norms`` (zero-norm guard,
    same multiply/divide order)."""
    return (
        f"CASE WHEN {na} * {nb} = 0 THEN CAST(0 AS DOUBLE) "
        f"ELSE {dot_sql(a, b, dim)} / ({na} * {nb}) END"
    )
