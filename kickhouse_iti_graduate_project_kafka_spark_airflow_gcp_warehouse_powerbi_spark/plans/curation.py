"""Training-data curation plans: dedup clustering, contamination checks,
deterministic sampling, corpus statistics, shard assignment.

These extend the dedup/similarity family (SURVEY.md §7 step 7 / project
brief) with the operations a pretraining-data pipeline runs *after* pair
generation: resolve pairs into clusters (keep one doc per cluster), check
a training corpus for benchmark contamination, draw reproducible samples,
and lay the surviving corpus out into token-balanced shards.

Every query here has a DuckDB oracle; cross-engine determinism notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.cc import cluster_sizes, connected_components
from ..operators.dedup import ngram_jaccard_pairs
from ..sources.tables import load_table

#: DuckDB CTE: distinct 3-word shingle sets per doc (mirrors
#: operators/dedup.shingle_rows semantics; shared with llm_text oracles)
_SHINGLES_CTE = r"""
    t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
               list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t WHERE len(toks) >= 3
    )
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "docs_dup_clusters",
    bench=True,
    tags=("dedup", "cc", "iterative"),
    oracle="WITH RECURSIVE "
    + _SHINGLES_CTE
    + """,
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE LEN(list_intersect(a.sh, b.sh)) * 1.0
              / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ), reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
    ), comp AS (
        SELECT id, MIN(r) AS component FROM reach GROUP BY id
    )
    SELECT component AS cluster_rep, COUNT(*) AS cluster_size
    FROM comp GROUP BY component
    """,
)
def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (3-gram Jaccard >= 0.5) resolved into connected
    components via alternating large-star/small-star (operators/cc.py);
    every document labels with its cluster's minimum doc_id. The oracle
    computes the same transitive closure with a recursive CTE — exact
    match proves both the pair generation AND the O(log n)-round cluster
    resolution. Output: one row per cluster (singletons included)."""
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    comps = connected_components(
        pairs, src="a_id", dst="b_id", nodes=docs.select(F.col("doc_id").alias("id"))
    )
    return cluster_sizes(comps).select(
        F.col("component").alias("cluster_rep"), "cluster_size"
    )


@register(
    "docs_dedup_survivors",
    tags=("dedup", "cc"),
    oracle="WITH RECURSIVE "
    + _SHINGLES_CTE
    + """,
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE LEN(list_intersect(a.sh, b.sh)) * 1.0
              / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ), reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
    ), comp AS (
        SELECT id, MIN(r) AS component FROM reach GROUP BY id
    )
    SELECT d.lang, COUNT(*) AS n_docs,
           SUM(CASE WHEN c.component = d.doc_id THEN 1 ELSE 0 END) AS n_kept,
           COUNT(*) - SUM(CASE WHEN c.component = d.doc_id THEN 1 ELSE 0 END)
               AS n_dropped
    FROM documents d JOIN comp c ON c.id = d.doc_id
    GROUP BY d.lang
    """,
)
def docs_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision a dedup pipeline actually ships: keep the
    cluster representative (minimum doc_id), drop the rest — aggregated
    per language. Deterministic because the representative is the
    component min, not an arbitrary survivor."""
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    comps = connected_components(
        pairs, src="a_id", dst="b_id", nodes=docs.select(F.col("doc_id").alias("id"))
    )
    labeled = docs.join(comps, docs["doc_id"] == comps["id"])
    kept = F.when(F.col("component") == F.col("doc_id"), 1).otherwise(0)
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        (F.count(F.lit(1)) - F.sum(kept)).alias("n_dropped"),
    )
