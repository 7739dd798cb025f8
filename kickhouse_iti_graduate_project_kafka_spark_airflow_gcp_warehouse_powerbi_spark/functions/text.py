"""Text-analysis expression library for training-data pipelines.

All JVM-side Column expressions (no Python UDFs): tokenization, shingling,
stopword/quality metrics, language-ID heuristics, fingerprints. These are
the building blocks for the dedup/quality operators in ``operators/`` and
the `documents`-table plans in ``plans/llm_text.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/keyword language
#: heuristic. Order = tie-break priority.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|of|and|to|in)\b"),
    ("fr", r"\b(le|la|les|et|des)\b"),
    ("de", r"\b(der|die|das|und|nicht)\b"),
    ("es", r"\b(el|los|las|y|una)\b"),
    ("zh", r"[一-鿿]"),
]

EN_STOPWORDS_PATTERN = r"\b(the|a|of|to|and)\b"


def tokens(col: str | Column, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), pattern)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("long")


def shingles_from_tokens(toks_col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a pre-tokenized array<string> column.

    IMPORTANT: pass a *column reference* (materialized tokens), not the
    split() expression itself — higher-order functions are interpreted (not
    whole-stage-codegen), so an inlined split would be re-evaluated on every
    one of the ~2n references per row. Tokenize in one projection, shingle
    in the next (Catalyst's CollapseProject keeps non-cheap aliases
    materialized). Documents shorter than ``n`` tokens yield an empty array.
    """
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles straight from a text column. Convenience for
    small inputs/tests; hot paths should tokenize first and call
    shingles_from_tokens (see its docstring)."""
    return shingles_from_tokens(tokens(col), n)


def stopword_count(col: str | Column, pattern: str = EN_STOPWORDS_PATTERN) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(pattern)).cast("long")


def punct_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[^\w\s]")).cast("long")


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: stopword-ratio band + length
    band, the shape of standard pretraining-data quality filters (length /
    punctuation / stopword-ratio features)."""
    n_tok = token_count(col)
    n_stop = stopword_count(col)
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    len_ok = F.when((n_tok >= 20) & (n_tok <= 1000), F.lit(0.5)).otherwise(F.lit(0.0))
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), F.lit(0.5)).otherwise(
        F.lit(0.0)
    )
    return F.round(len_ok + stop_ok, 2)


def lang_guess(col: str | Column) -> Column:
    """Marker-frequency language heuristic: first language (priority order)
    whose marker regex hits >= 2 of the lowercased text; 'und' otherwise."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    out = None
    for lang, pat in LANG_MARKERS:
        cond = F.regexp_count(c, F.lit(pat)) >= 2
        out = F.when(cond, F.lit(lang)) if out is None else out.when(cond, F.lit(lang))
    return out.otherwise(F.lit("und"))


def fingerprint64(col: str | Column) -> Column:
    """64-bit document fingerprint: xxhash64 of whitespace-normalized,
    lowercased text. Deterministic across runs/partitions — the cheap
    exact-dup identity for ``operators/dedup.exact_dedup``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
