"""Lexical (BM25) and hybrid (RRF-fused) retrieval plans.

The sparse twin of the ANN catalog queries in ``llm_vectors.py``: BM25
top-k over the `documents` table, and reciprocal-rank fusion of the BM25
list with the brute-force-cosine list over `embeddings` — the standard
hybrid-retrieval shape (Cormack et al., "Reciprocal Rank Fusion
outperforms Condorcet..."). No counterpart in the reference repo (its
serving layer is ClickHouse aggregations); part of the LLM-pipeline
extension surface (SURVEY.md §7 step 7).

Determinism contract (driver value-hash): BM25 ranks are computed over the
score ROUNDED to 4 dp (ties — e.g. exact-duplicate documents — break by
neighbor id), and RRF scores are exact rational functions of the two
integer ranks, rounded to 6 dp. Both oracles replay the identical
ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.bm25 import bm25_score_topk
from ..operators.similarity import brute_force_topk
from ..sources.tables import load_table

#: shared DuckDB scoring pipeline: tokenize once, postings, doc lengths,
#: global stats, query-term idf, per-(query, doc) BM25 sum, rounded-score
#: ranking with id tie-break — line-for-line the plan bm25_score_topk
#: declares. k1=1.2, b=0.75, Lucene idf.
_DUCKDB_BM25 = r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'),
                           t -> t != '') AS t
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY doc_id, term
    ), dl AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), qt AS (
        SELECT DISTINCT doc_id AS q_id, unnest(t) AS term
        FROM toks WHERE doc_id < 5
    ), idf AS (
        SELECT d.term, LN(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
        FROM (SELECT term, COUNT(*) AS df FROM tf
              WHERE term IN (SELECT DISTINCT term FROM qt)
              GROUP BY term) d, stats s
    ), bm25_scored AS (
        SELECT qt.q_id, tf.doc_id AS n_id,
               -- grouping mirrors the Spark expression exactly:
               -- idf * (tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)));
               -- CASTs keep everything in DOUBLE (a DuckDB decimal literal
               -- would otherwise pull the numerator into DECIMAL math)
               ROUND(SUM(idf.idf *
                         ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (1.0 - 0.75
                                            + 0.75 * dl.dl / s.avgdl))))
                     + 1e-9, 4) AS score
        FROM qt
        JOIN tf USING (term)
        JOIN idf ON tf.term = idf.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s
        WHERE tf.doc_id != qt.q_id
        GROUP BY qt.q_id, tf.doc_id
    ), bm25_ranked AS (
        SELECT q_id, n_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY score DESC, n_id ASC
               ) AS INTEGER) AS rank
        FROM bm25_scored
    )
"""


@register(
    "docs_bm25_topk",
    bench=True,
    tags=("retrieval", "text"),
    oracle=_DUCKDB_BM25 + """
    SELECT q_id, n_id, score, rank FROM bm25_ranked WHERE rank <= 10
    """,
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query (query set = docs with doc_id < 5) — lexical
    retrieval over the corpus. One tokenize pass builds the postings
    (persisted via cachereg for its four consumers); query terms broadcast
    as a semi-filter so only matching postings ever move; ranking windows
    partition per query. See operators/bm25.py for the 100 TB posture and
    the persisted-index lifecycle twin."""
    from ..operators.spread import spread_for_cpu

    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    return bm25_score_topk(
        docs, docs.filter(F.col("doc_id") < 5), k=10, cache_key=sf_dir
    )


@register(
    "hybrid_rrf_retrieval",
    bench=True,
    tags=("retrieval", "similarity"),
    oracle=_DUCKDB_BM25 + """
    , dense_scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])) DESC,
                   c.vec_id ASC) AS INTEGER) AS rank
        FROM embeddings c
        JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
          ON c.vec_id != q.vec_id
    ), fused AS (
        SELECT COALESCE(s.q_id, d.q_id) AS q_id,
               COALESCE(s.n_id, d.n_id) AS n_id,
               ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + s.rank), 0)
                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + d.rank), 0)
                     + 1e-9, 6) AS rrf
        FROM (SELECT q_id, n_id, rank FROM bm25_ranked WHERE rank <= 20) s
        FULL OUTER JOIN (SELECT q_id, n_id, rank FROM dense_scored
                         WHERE rank <= 20) d
          ON s.q_id = d.q_id AND s.n_id = d.n_id
    )
    SELECT q_id, n_id, rrf,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY rrf DESC, n_id ASC
           ) AS INTEGER) AS rank
    FROM fused
    QUALIFY rank <= 10
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k0=60) of the BM25 top-20
    (lexical, documents) and the brute-force-cosine top-20 (dense,
    embeddings, vec_id aligned with doc_id) — top-10 fused per query.

    Each leg is the already-proven catalog operator; fusion itself is a
    full-outer join on (q_id, n_id) of two k-bounded rank lists — at most
    2k rows per query regardless of corpus size, so the fusion stage costs
    nothing at 100 TB; all the scale weight stays in the legs. Docs without
    an embedding (sf0.1 covers only a prefix) simply lack a dense rank —
    RRF's standard missing-leg = 0 contribution."""
    from ..operators.spread import spread_for_cpu

    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = bm25_score_topk(
        docs, docs.filter(F.col("doc_id") < 5), k=20, cache_key=sf_dir
    ).select("q_id", "n_id", F.col("rank").alias("rank_s"))
    dense = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=20).select(
        "q_id", "n_id", F.col("rank").cast("int").alias("rank_d")
    )
    fused = (
        sparse.join(dense, ["q_id", "n_id"], "full_outer")
        .select(
            "q_id",
            "n_id",
            F.round(
                F.coalesce(1.0 / (F.lit(60) + F.col("rank_s")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(60) + F.col("rank_d")), F.lit(0.0))
                + 1e-9,
                6,
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col("n_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("q_id", "n_id", "rrf", "rank")
    )
