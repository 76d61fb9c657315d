"""Vector column functions (SURVEY.md §2.8 F6-F8): cosine similarity,
L2 normalization, and the deterministic embedding stub.

Cosine is a pure Catalyst higher-order-function expression — JVM-side,
whole-stage-codegen'd, no Python in the hot path (reference computes it
in numpy per pair, ``embedding_service.py:181-209``).  The real encoder
(sentence-transformers, ``embedding_service.py:98-179``) is an external
model; the engine's default is a deterministic hash-projection stub so
every retrieval pipeline is exactly reproducible without a model.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision (deterministic:
    left-to-right, same as the DuckDB oracle's list fold)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖) with zero-norm guard (reference
    ``embedding_service.py:181-209``)."""
    n = l2_norm(a) * l2_norm(b)
    return F.when(n == 0.0, F.lit(0.0)).otherwise(dot(a, b) / n)


def cosine_given_norms(
    a: Column | str, b: Column | str, na: Column, nb: Column
) -> Column:
    """``cosine`` with both L2 norms supplied as precomputed columns.

    Higher-order array folds are interpreted per-row (not whole-stage
    codegen'd), so in any join-scoring plan the norms should be computed
    ONCE per input row below the join — not once per output pair.  Scoring
    N vectors against M probes this way runs N+M norm folds instead of
    2·N·M.  Bit-identical to ``cosine`` (same fold, same multiply order),
    so oracle parity under round(…, 6) is preserved.
    """
    n = na * nb
    return F.when(n == 0.0, F.lit(0.0)).otherwise(dot(a, b) / n)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an embedding column (F8; reference normalizes before
    clustering, ``clustering_service.py:406-411``)."""
    arr = _as_double(a)
    n = l2_norm(a)
    return F.when(n == 0.0, arr).otherwise(
        F.transform(arr, lambda x: x / n)
    )


# ---------------------------------------------------------------------------
# Deterministic embedding stub (F7)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=65536)
def _token_vector(token: str, dim: int) -> np.ndarray:
    """Pseudo-random unit-ish vector derived from the token's sha1 — stable
    across processes/partitions (no Python hash randomization).  Memoized:
    corpus vocabularies are Zipfian, so the per-token RNG construction —
    the dominant cost of the stub — amortizes to near zero per worker."""
    seed = int.from_bytes(hashlib.sha1(token.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def hash_embed_text(text: str | None, dim: int = 64) -> list[float]:
    """Bag-of-tokens hash embedding, L2-normalized — the engine's stand-in
    for the reference's sentence-transformer encode
    (``embedding_service.py:98-130``; 512-char truncation kept)."""
    if not text:
        return [0.0] * dim
    acc = np.zeros(dim)
    for tok in text[:512].split():
        acc += _token_vector(tok, dim)
    n = float(np.linalg.norm(acc))
    if n > 0:
        acc /= n
    return [float(x) for x in acc]


def hash_embed_udf(dim: int = 64):
    """Arrow-batched encoder stub: text → array<float>[dim].  Swap in a real
    model by replacing this UDF — the pipeline shape (mapInPandas over
    batches, reference batch_size=32) is identical."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed_text(t, dim))

    return _embed
