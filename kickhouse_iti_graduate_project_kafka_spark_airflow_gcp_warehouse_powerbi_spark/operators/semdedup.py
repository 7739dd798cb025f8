"""Semantic (embedding-space) dedup: cluster-then-prune, SemDeDup-style.

Pairwise cosine near-dup over a whole corpus is O(N²) — a non-starter at
100 TB. The published fix (SemDeDup, Abbas et al. 2023, arXiv:2303.09540)
bounds the comparisons with a coarse k-means partition: near-duplicates in
embedding space land in the same cluster with high probability, so only
within-cluster pairs are ever scored. Total work drops to O(Σ|cellᵢ|²)
with k tunable — at corpus scale k grows with N so cells stay
shuffle-partition-sized, and the cell id doubles as the shuffle key (ONE
exchange; no pair ever crosses cells).

Pruning policy — **dominance**, not greedy-chain: vector *v* is pruned iff
some vector *u* in the same cell has ``cos(u, v) > tau`` and *u* ranks
before *v* (rank = centroid-cosine ASC, id ASC — SemDeDup keeps the
LOW-centroid-similarity "edge" examples, the paper's best-performing
keep rule). Dominance is monotone and embarrassingly parallel (one
within-cell join decides every vector independently); a greedy sequential
scan would need per-cell ``applyInPandas`` state and can only differ by
keeping MORE near-dup chains, never fewer distinct survivors per clique.
Identical vectors are mutual duplicates at any tau < 1, so exactly the
rank-first one survives — the exact-dedup degenerate case comes out right
by construction.

Reference parity: the reference's dedup story is key-level
(ReplacingMergeTree latest-per-key, README.md:475-477) — semantic dedup is
part of the LLM-curation extension surface (project brief), composed from
the same k-means machinery as operators/ivf.py.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot, norm


def semdedup(
    corpus: DataFrame,
    tau: float = 0.95,
    centroids: list[np.ndarray] | None = None,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, cent_cos, is_pruned) for every non-null vector.

    ``is_pruned`` marks vectors dominated by an earlier-ranked near-dup
    (cosine > ``tau``) in the same k-means cell. Survivors are the
    ``~is_pruned`` rows; join back on ``id_col`` for full columns.

    Physical shape: one cell-key shuffle for the within-cell self-join
    (both sides ARE the same cell-partitioned frame), candidate pairs
    bounded by cell sizes, then a cell-local aggregation — never a
    corpus-wide pairwise product. ``centroids`` may come from a persisted
    index (operators/ivf.build_ivf_index) so re-runs at a new ``tau``
    skip the k-means fit entirely.
    """
    from .ivf import assign_cells_df, kmeans_centroids

    if centroids is None:
        centroids = kmeans_centroids(
            corpus, vec_col, id_col, n_cells=n_cells, iters=iters
        )
    base = corpus.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    cells = assign_cells_df(base, centroids, vec_col="_v")

    # centroid-cosine rank key: join the k-row centroid table (broadcast)
    # rather than inlining k x dim literals into the plan
    spark = corpus.sparkSession
    cent_tbl = spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "cell int, _cent array<double>",
    )
    ranked = (
        cells.join(F.broadcast(cent_tbl), "cell")
        .select(
            "id",
            "cell",
            "_v",
            norm("_v").alias("_nrm"),
            F.try_divide(dot("_v", "_cent"), norm("_v") * norm("_cent")).alias(
                "cent_cos"
            ),
        )
        .withColumn("cent_cos", F.coalesce(F.col("cent_cos"), F.lit(0.0)))
    )

    a = ranked.select(
        F.col("cell"),
        F.struct("cent_cos", "id").alias("a_rank"),
        F.col("id").alias("a_id"),
        F.col("_v").alias("a_v"),
        F.col("_nrm").alias("a_nrm"),
    )
    b = ranked.select(
        F.col("cell"),
        F.struct("cent_cos", "id").alias("b_rank"),
        F.col("id").alias("b_id"),
        F.col("_v").alias("b_v"),
        F.col("_nrm").alias("b_nrm"),
    )
    dominated = (
        a.join(b, "cell")
        .filter(F.col("a_rank") < F.col("b_rank"))
        .filter(
            F.try_divide(dot("a_v", "b_v"), F.col("a_nrm") * F.col("b_nrm"))
            > F.lit(float(tau))
        )
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    return (
        ranked.join(dominated.withColumn("_pr", F.lit(True)), "id", "left")
        .select(
            "id",
            "cell",
            "cent_cos",
            F.coalesce(F.col("_pr"), F.lit(False)).alias("is_pruned"),
        )
    )


def semdedup_survivors(
    corpus: DataFrame,
    tau: float = 0.95,
    centroids: list[np.ndarray] | None = None,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The corpus restricted to semantic-dedup survivors (original
    columns), via a broadcast-friendly semi-join on the kept ids."""
    marks = semdedup(corpus, tau, centroids, n_cells, iters, vec_col, id_col)
    keep = marks.filter(~F.col("is_pruned")).select(F.col("id").alias(id_col))
    return corpus.join(keep, id_col, "left_semi")
