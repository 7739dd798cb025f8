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


def semdedup_incremental(
    batch: DataFrame,
    survivors: DataFrame,
    tau: float = 0.95,
    centroids: list[np.ndarray] | None = None,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, is_pruned, pruned_by) for each non-null batch vector —
    incremental-ingest semantic dedup with **first-seen-wins** policy: a
    batch vector is pruned if a corpus survivor in its cell is a near-dup
    (``pruned_by = 'corpus'`` — survivors always outrank arrivals,
    whatever their centroid-cosine), else if an earlier-ranked batch
    vector dominates it (``pruned_by = 'batch'``, same dominance rule as
    :func:`semdedup`).

    Cost ∝ batch, never corpus²: the corpus side contributes only the
    cells the batch actually touches (cell-key join after a semi-join
    prune), and within-batch pairs are batch-sized. Pass ``centroids``
    from the fitted corpus (or a persisted IVF index) — fitting on the
    batch alone would drift cell boundaries between ingests. With an
    empty corpus this reduces exactly to :func:`semdedup` on the batch
    (tested)."""
    from .ivf import assign_cells_df, kmeans_centroids

    if centroids is None:
        centroids = kmeans_centroids(
            survivors if survivors.limit(1).count() else batch,
            vec_col, id_col, n_cells=n_cells, iters=iters,
        )
    spark = batch.sparkSession
    cent_tbl = spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "cell int, _cent array<double>",
    )

    def _prep(df: DataFrame) -> DataFrame:
        base = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("_v")
        ).filter(F.col("_v").isNotNull())
        return (
            assign_cells_df(base, centroids, vec_col="_v")
            .join(F.broadcast(cent_tbl), "cell")
            .select(
                "id",
                "cell",
                "_v",
                norm("_v").alias("_nrm"),
                F.coalesce(
                    F.try_divide(
                        dot("_v", "_cent"), norm("_v") * norm("_cent")
                    ),
                    F.lit(0.0),
                ).alias("cent_cos"),
            )
        )

    b = _prep(batch)
    touched = b.select("cell").distinct()
    c = _prep(survivors).join(touched, "cell", "left_semi")

    def _cos(l_v, l_n, r_v, r_n):
        return F.try_divide(dot(l_v, r_v), F.col(l_n) * F.col(r_n))

    by_corpus = (
        b.select("cell", F.col("id").alias("b_id"), F.col("_v").alias("b_v"),
                 F.col("_nrm").alias("b_nrm"))
        .join(
            c.select("cell", F.col("_v").alias("c_v"),
                     F.col("_nrm").alias("c_nrm")),
            "cell",
        )
        .filter(_cos("b_v", "b_nrm", "c_v", "c_nrm") > F.lit(float(tau)))
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    ba = b.select(
        "cell", F.struct("cent_cos", "id").alias("a_rank"),
        F.col("_v").alias("a_v"), F.col("_nrm").alias("a_nrm"),
    )
    bb = b.select(
        "cell", F.struct("cent_cos", "id").alias("b_rank"),
        F.col("id").alias("b_id"), F.col("_v").alias("b_v"),
        F.col("_nrm").alias("b_nrm"),
    )
    by_batch = (
        ba.join(bb, "cell")
        .filter(F.col("a_rank") < F.col("b_rank"))
        .filter(_cos("a_v", "a_nrm", "b_v", "b_nrm") > F.lit(float(tau)))
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    return (
        b.join(by_corpus.withColumn("_pc", F.lit(True)), "id", "left")
        .join(by_batch.withColumn("_pb", F.lit(True)), "id", "left")
        .select(
            "id",
            "cell",
            (F.coalesce(F.col("_pc"), F.lit(False))
             | F.coalesce(F.col("_pb"), F.lit(False))).alias("is_pruned"),
            F.when(F.coalesce(F.col("_pc"), F.lit(False)), F.lit("corpus"))
            .when(F.coalesce(F.col("_pb"), F.lit(False)), F.lit("batch"))
            .alias("pruned_by"),
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
