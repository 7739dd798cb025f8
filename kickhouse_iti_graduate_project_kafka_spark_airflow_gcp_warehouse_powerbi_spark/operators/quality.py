"""Model-based quality scoring — the fastText/CCNet-style linear
classifier stage of a curation pipeline, as pure DataFrame algebra.

Features are md5 buckets of each DISTINCT token (engine-portable, the
same hashing contract the sampling/split operators use); each bucket
carries an integer milli-weight; the per-document score is an EXACT
integer sum, so the keep decision is a sign test with no float
summation-order hazard; the sigmoid probability is derived afterwards
for reporting only.

The closed-form weight ``w(b) = (b * 2654435761) % 1001 - 500`` stands in
for learned weights (deterministic, replayable in SQL); in production the
weight table is a broadcast join (2^20 rows) — everything else (explode
distinct terms, map-side-combined per-doc integer aggregate, narrow
sigmoid projection) is already the 100 TB shape: one doc-keyed partial
aggregate, nothing corpus-wide shuffles but (doc_id, 8-byte term hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

N_BUCKETS = 1024


def hashed_quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, n_terms, score_milli, prob, keep) for EVERY input row —
    empty/whitespace-only documents score 0 terms, probability 0.5, and
    keep=True (sign test on score 0)."""
    toks = df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_toks"))
    terms = toks.select(
        "_id", F.explode(F.array_distinct("_toks")).alias("term")
    ).filter(F.col("term") != "")
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") % N_BUCKETS
    )
    wt = (bucket * F.lit(2654435761)) % 1001 - 500
    s = terms.select("_id", wt.alias("wt")).groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("wt").alias("score")
    )
    j = df.select(F.col(id_col).alias("_id")).join(s, "_id", "left")
    n_terms = F.coalesce("n_terms", F.lit(0)).cast("long")
    score = F.coalesce("score", F.lit(0)).cast("long")
    logit = F.col("score").cast("double") / (1000.0 * F.col("n_terms"))
    return j.select(
        F.col("_id").alias(id_col),
        n_terms.alias("n_terms"),
        score.alias("score_milli"),
        F.round(
            F.when(F.coalesce("n_terms", F.lit(0)) == 0, F.lit(0.5)).otherwise(
                1.0 / (1.0 + F.exp(-logit))
            )
            + 1e-9,
            6,
        ).alias("prob"),
        (score >= 0).alias("keep"),
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep only rows the classifier accepts (exact integer sign test).
    Returns the input columns unchanged — a drop-in pipeline stage."""
    kept = hashed_quality_scores(df, text_col, id_col).filter("keep").select(id_col)
    return df.join(kept, id_col, "left_semi")
