"""Text analysis for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These extend the reference's surface (SURVEY.md §7.2 step 9 "scale
extensions"): a corpus-curation engine needs them as first-class,
oracle-checkable operators.  Each operator is defined ONCE as config and
rendered twice — a Spark ``Column`` (JVM-side, codegen'd; no UDFs) and
the equivalent DuckDB SQL — so engine and oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Language ID: marker-token voting (n-gram-free heuristic).  Deterministic
# argmax with a fixed priority order for ties.
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "nicht", "das"),
    "fr": ("le", "et", "les", "une"),
    "es": ("el", "y", "los", "una"),
}
#: Tie-break priority (first wins on equal scores).
LANG_PRIORITY = ("en", "de", "fr", "es")


def _tokens(text_col: Column) -> Column:
    return F.split(text_col, " ")


def lang_score(text_col: Column, lang: str) -> Column:
    """Number of tokens that are marker words for ``lang``."""
    toks = _tokens(text_col)
    score = F.lit(0)
    for marker in LANG_MARKERS[lang]:
        score = score + F.size(
            F.filter(toks, lambda w: w == F.lit(marker))  # noqa: B023
        )
    return score


def lang_score_sql(text_expr: str, lang: str) -> str:
    parts = [
        f"len(list_filter(string_split({text_expr}, ' '), w -> w = '{m}'))"
        for m in LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(parts) + ")"


def lang_id(text_col: Column) -> Column:
    """Argmax over language scores; sequential first-match-wins CASE makes
    LANG_PRIORITY the tie-break; 'unk' when every score is zero.  The SQL
    twin (:func:`lang_id_sql`) renders the identical CASE."""
    scores = {lang: lang_score(text_col, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = None
    for lang in LANG_PRIORITY:
        cond = (scores[lang] > 0) & (scores[lang] >= best)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unk"))


def lang_id_sql(text_expr: str) -> str:
    s = {lang: lang_score_sql(text_expr, lang) for lang in LANG_PRIORITY}
    best = "greatest(" + ", ".join(s.values()) + ")"
    cases = [
        f"WHEN {s[lang]} > 0 AND {s[lang]} >= {best} THEN '{lang}'"
        for lang in LANG_PRIORITY
    ]
    return "CASE " + " ".join(cases) + " ELSE 'unk' END"


# ---------------------------------------------------------------------------
# Token counting + quality scoring
# ---------------------------------------------------------------------------

PUNCT_CLASS = r"[^.,!?;:]"
STOPWORDS = ("the", "a", "and", "of", "is", "to")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (empty tokens excluded)."""
    return F.size(F.filter(_tokens(text_col), lambda w: w != F.lit("")))


TOKEN_COUNT_SQL = "len(list_filter(string_split({t}, ' '), w -> w <> ''))"


def punct_count(text_col: Column) -> Column:
    return F.length(F.regexp_replace(text_col, PUNCT_CLASS, ""))


PUNCT_COUNT_SQL = "len(regexp_replace({t}, '[^.,!?;:]', '', 'g'))"


def stopword_count(text_col: Column) -> Column:
    toks = _tokens(text_col)
    out = F.lit(0)
    for sw in STOPWORDS:
        out = out + F.size(F.filter(toks, lambda w: w == F.lit(sw)))  # noqa: B023
    return out


STOPWORD_COUNT_SQL = " + ".join(
    f"len(list_filter(string_split({{t}}, ' '), w -> w = '{sw}'))"
    for sw in STOPWORDS
)


def quality_score(text_col: Column, nchars_col: Column) -> Column:
    """Composite quality in [0,1]: length saturation (0.4), token-count
    saturation (0.4), stopword presence (0.2) — the reference's
    length/ratio heuristics generalized into one curve.  Rounded to 4 so
    the oracle matches exactly."""
    toks = token_count(text_col).cast("double")
    nchars = nchars_col.cast("double")
    stop_ratio = F.when(toks == 0, F.lit(0.0)).otherwise(
        stopword_count(text_col).cast("double") / toks
    )
    return F.round(
        F.least(nchars / 500.0, F.lit(1.0)) * 0.4
        + F.least(toks / 80.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2,
        4,
    )


def quality_score_sql(text_expr: str, nchars_expr: str) -> str:
    toks = TOKEN_COUNT_SQL.format(t=text_expr)
    stops = STOPWORD_COUNT_SQL.format(t=text_expr)
    stop_ratio = (
        f"CASE WHEN {toks} = 0 THEN 0.0 "
        f"ELSE CAST({stops} AS DOUBLE) / {toks} END"
    )
    return (
        f"ROUND(least(CAST({nchars_expr} AS DOUBLE) / 500.0, 1.0) * 0.4"
        f" + least(CAST({toks} AS DOUBLE) / 80.0, 1.0) * 0.4"
        f" + least(({stop_ratio}) * 5.0, 1.0) * 0.2, 4)"
    )


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(text_col: Column) -> Column:
    """Canonical content fingerprint: md5 of the lowercased,
    whitespace-collapsed text.  The exact-dedup key (F11/F12 analogue and
    the hash-groupBy dedup primitive)."""
    return F.md5(
        F.regexp_replace(F.lower(text_col), r"\s+", " ").cast("binary")
    )


FINGERPRINT_SQL = "md5(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"
