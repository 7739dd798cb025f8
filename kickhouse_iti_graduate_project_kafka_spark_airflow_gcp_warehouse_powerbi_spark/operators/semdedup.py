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
keep rule). Dominance is monotone and embarrassingly parallel (each cell
decides every vector independently); a greedy sequential scan would need
per-cell state and can only differ by keeping MORE near-dup chains, never
fewer distinct survivors per clique. Identical vectors are mutual
duplicates at any tau < 1, so exactly the rank-first one survives — the
exact-dedup degenerate case comes out right by construction.

Physical shape: the within-cell scoring runs as an Arrow-batched
``applyInPandas`` gram kernel — each cell group is unit-normalized once
and scored with a BLAS matrix product in column blocks (memory
O(cell × block), never O(cell²) at once). A DataFrame self-join with
per-pair ``zip_with`` dots expresses the same thing but runs on
Catalyst's interpreted higher-order-function path: measured 41 s vs ~4 s
for the full stats query at sf0.1 (see operators/ivf.py's
LITERAL_SCORE_BUDGET note for the same effect on cell assignment).

Reference parity: the reference's dedup story is key-level
(ReplacingMergeTree latest-per-key, README.md:475-477) — semantic dedup is
part of the LLM-curation extension surface (project brief), composed from
the same k-means machinery as operators/ivf.py.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cachereg import track_broadcast

#: column-block width for the per-cell gram product — bounds kernel memory
#: at O(cell_size x block) doubles
_GRAM_BLOCK = 2048


def _unit_rows(vecs) -> tuple[np.ndarray, np.ndarray]:
    """(unit-normalized matrix, valid-row mask). Zero/invalid-norm rows
    come back as zero rows with valid=False — they can neither dominate
    nor be dominated (cosine with a zero vector is undefined/NULL)."""
    V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    nrm = np.linalg.norm(V, axis=1)
    valid = nrm > 0
    U = np.divide(V, nrm[:, None], out=np.zeros_like(V), where=valid[:, None])
    return U, valid


def _dominated_in_rank_order(Us: np.ndarray, valid_s: np.ndarray, tau: float) -> np.ndarray:
    """Boolean mask over rank-sorted unit rows: row j is dominated iff some
    earlier row i (i < j, both valid) has ``Us[i] . Us[j] > tau``.
    Tiled over BOTH operands, so peak gram memory is O(block²) — ~32 MB at
    block 2048 — independent of cell size; the cell's own rows are the
    only O(cell) term."""
    m = Us.shape[0]
    out = np.zeros(m, dtype=bool)
    for s in range(1, m, _GRAM_BLOCK):
        e = min(s + _GRAM_BLOCK, m)
        cols = np.arange(s, e)[None, :]
        vcol = valid_s[None, s:e]
        acc = np.zeros(e - s, dtype=bool)
        for r0 in range(0, e, _GRAM_BLOCK):
            r1 = min(r0 + _GRAM_BLOCK, e)
            G = Us[r0:r1] @ Us[s:e].T  # (r1-r0, e-s)
            rows = np.arange(r0, r1)[:, None]
            acc |= (
                (G > tau) & (rows < cols) & valid_s[r0:r1, None] & vcol
            ).any(axis=0)
        out[s:e] = acc
    return out


_MARK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("cent_cos", T.DoubleType()),
        T.StructField("is_pruned", T.BooleanType()),
    ]
)


def cell_centroids(
    corpus: DataFrame,
    cell_col: str,
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> dict[int, np.ndarray]:
    """Per-cell centroid = the mean of the cell's VALID unit vectors
    (zero-norm rows excluded), rounded to ``round_decimals`` so partition
    summation order cannot leak into the result — the same determinism
    posture as ``ivf.kmeans_centroids``. One zero-shuffle ``mapInPandas``
    partial-sums pass: at most n_partitions x n_cells tiny rows reach the
    driver. Cells here are EXISTING values of ``cell_col`` (a label, an
    IVF cell id), not k-means indices."""
    import pandas as pd  # noqa: F401 — executor-side import below

    vecs = corpus.select(
        F.col(cell_col).cast("int").alias("_cell"), F.col(vec_col).alias("_v")
    ).filter(F.col("_v").isNotNull())

    def partials(batches):
        import pandas as pd

        cnt: dict[int, int] = {}
        sums: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            n = np.linalg.norm(V, axis=1)
            valid = n > 0
            U = np.divide(V, n[:, None], out=np.zeros_like(V), where=valid[:, None])
            cells = pdf["_cell"].to_numpy()
            for c in np.unique(cells[valid]):
                m = valid & (cells == c)
                cnt[int(c)] = cnt.get(int(c), 0) + int(m.sum())
                sums[int(c)] = sums.get(int(c), 0.0) + U[m].sum(axis=0)
        if cnt:
            yield pd.DataFrame(
                {
                    "cell": list(cnt),
                    "cnt": [cnt[c] for c in cnt],
                    "sums": [sums[c] for c in cnt],
                }
            )

    rows = vecs.mapInPandas(partials, "cell int, cnt long, sums array<double>").collect()
    tot_cnt: dict[int, int] = {}
    tot_sum: dict[int, np.ndarray] = {}
    for r in rows:
        c = int(r["cell"])
        tot_cnt[c] = tot_cnt.get(c, 0) + int(r["cnt"])
        tot_sum[c] = tot_sum.get(c, 0.0) + np.asarray(r["sums"], dtype="float64")
    return {
        c: np.round(tot_sum[c] / tot_cnt[c], round_decimals) for c in tot_cnt
    }


def semdedup(
    corpus: DataFrame,
    tau: float = 0.95,
    centroids: list[np.ndarray] | None = None,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str | None = None,
    max_train_rows: int | None | str = "auto",
) -> DataFrame:
    """(id, cell, cent_cos, is_pruned) for every non-null vector.

    ``is_pruned`` marks vectors dominated by an earlier-ranked near-dup
    (cosine > ``tau``) in the same cell. Survivors are the
    ``~is_pruned`` rows; join back on ``id_col`` for full columns.

    One cell-key shuffle feeds the per-cell gram kernel; candidate pairs
    are bounded by cell sizes — never a corpus-wide pairwise product.
    ``centroids`` may come from a persisted index
    (operators/ivf.build_ivf_index) so re-runs at a new ``tau`` skip the
    k-means fit entirely.

    ``cell_col``: reuse an EXISTING partition of the corpus (a label
    column, a materialized IVF cell id) instead of fitting/assigning
    k-means cells — no fit pass, no assignment scoring; the rank
    centroids are the per-cell unit-vector means (:func:`cell_centroids`,
    deterministic). Because the whole computation is then closed-form
    (no quantizer state), the survivor set is exactly replayable by an
    external engine — the DuckDB oracle for ``semdedup_survivor_ids``
    does precisely that."""
    from .ivf import assign_cells_df, kmeans_centroids

    spark = corpus.sparkSession
    if cell_col is not None:
        base = corpus.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("_v"),
            F.col(cell_col).cast("int").alias("cell"),
        ).filter(F.col("_v").isNotNull())
        cells = base
        cent_map = cell_centroids(corpus, cell_col, vec_col)
    else:
        if centroids is None:
            centroids = kmeans_centroids(
                corpus, vec_col, id_col, n_cells=n_cells, iters=iters,
                max_train_rows=max_train_rows,
            )
        base = corpus.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("_v")
        ).filter(F.col("_v").isNotNull())
        cells = assign_cells_df(base, centroids, vec_col="_v")
        cent_map = {
            i: np.asarray(c, dtype=np.float64) for i, c in enumerate(centroids)
        }
    bc = track_broadcast(spark.sparkContext.broadcast(cent_map))
    tau_f = float(tau)

    def prune(key, pdf):
        import pandas as pd

        cell = int(key[0])
        # canonical row order: group rows arrive in shuffle order, and BLAS
        # accumulation is only bitwise-stable for a FIXED operand layout —
        # sort by id so every partitioning computes the identical kernel
        pdf = pdf.sort_values("id", ignore_index=True)
        U, valid = _unit_rows(pdf["_v"])
        # a cell with no valid vectors has no centroid — every row there
        # is invalid anyway, so the zero-cent_cos path is exact
        c = bc.value.get(cell)
        cn = np.linalg.norm(c) if c is not None else 0.0
        cent_cos = (U @ (c / cn)) if cn > 0 else np.zeros(len(U))
        cent_cos = np.where(valid, cent_cos, 0.0)
        ids = pdf["id"].to_numpy()
        order = np.lexsort((ids, cent_cos))
        pruned_sorted = _dominated_in_rank_order(U[order], valid[order], tau_f)
        pruned = np.empty(len(order), dtype=bool)
        pruned[order] = pruned_sorted
        return pd.DataFrame(
            {
                "id": ids,
                "cell": np.full(len(ids), cell, dtype=np.int32),
                "cent_cos": cent_cos,
                "is_pruned": pruned,
            }
        )

    return cells.groupBy("cell").applyInPandas(prune, _MARK_SCHEMA)


_INC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("is_pruned", T.BooleanType()),
        T.StructField("pruned_by", T.StringType()),
    ]
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
    max_train_rows: int | None | str = "auto",
) -> DataFrame:
    """(id, cell, is_pruned, pruned_by) for each non-null batch vector —
    incremental-ingest semantic dedup with **first-seen-wins** policy: a
    batch vector is pruned if a corpus survivor in its cell is a near-dup
    (``pruned_by = 'corpus'`` — survivors always outrank arrivals,
    whatever their centroid-cosine), else if an earlier-ranked batch
    vector dominates it (``pruned_by = 'batch'``, same dominance rule as
    :func:`semdedup`).

    Cost ∝ batch, never corpus²: the corpus side contributes only the
    cells the batch actually touches (cell-semi-join prune before the
    shuffle), and within-batch pairs are batch-sized. Pass ``centroids``
    from the fitted corpus (or a persisted IVF index) — fitting on the
    batch alone would drift cell boundaries between ingests. With an
    empty corpus this reduces exactly to :func:`semdedup` on the batch
    (tested).

    ``max_train_rows`` defaults to ``"auto"`` like the rest of the
    family (:func:`semdedup`, ``build_ivf_index``, ``build_ivfpq_index``)
    so sampling behavior is consistent across the API; it only applies
    to the fallback k-means fit taken when ``centroids`` is None — the
    recommended path passes the fitted corpus centroids, where training
    never happens here at all. NOTE (since r10): corpora above the auto
    cap train on a deterministic sample, so centroid (and hence cell /
    pruning) assignments can differ from the pre-r10 exact fit; pass
    ``max_train_rows=None`` to restore the exact full-corpus fit."""
    from .ivf import assign_cells_df, kmeans_centroids

    if centroids is None:
        centroids = kmeans_centroids(
            survivors if survivors.limit(1).count() else batch,
            vec_col, id_col, n_cells=n_cells, iters=iters,
            max_train_rows=max_train_rows,
        )
    spark = batch.sparkSession

    def _prep(df: DataFrame, side: int) -> DataFrame:
        base = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("_v")
        ).filter(F.col("_v").isNotNull())
        return assign_cells_df(base, centroids, vec_col="_v").withColumn(
            "_side", F.lit(side)
        )

    b = _prep(batch, 1)
    touched = b.select("cell").distinct()
    c = _prep(survivors, 0).join(touched, "cell", "left_semi")
    both = b.unionByName(c)
    cmat = np.stack([np.asarray(x, dtype=np.float64) for x in centroids])
    bc = track_broadcast(spark.sparkContext.broadcast(cmat))
    tau_f = float(tau)

    def prune(key, pdf):
        import pandas as pd

        cell = int(key[0])
        # canonical row order (see semdedup.prune): corpus first, then id
        pdf = pdf.sort_values(["_side", "id"], ignore_index=True)
        is_b = (pdf["_side"] == 1).to_numpy()
        U, valid = _unit_rows(pdf["_v"])
        ids = pdf["id"].to_numpy()
        Ub, vb, idb = U[is_b], valid[is_b], ids[is_b]
        Uc, vc = U[~is_b], valid[~is_b]
        nb = len(idb)
        if nb == 0:
            return pd.DataFrame(
                {"id": ids[:0], "cell": np.array([], dtype=np.int32),
                 "is_pruned": np.array([], dtype=bool),
                 "pruned_by": np.array([], dtype=object)}
            )
        # corpus domination: any valid survivor with cos > tau (blocked)
        by_corpus = np.zeros(nb, dtype=bool)
        for s in range(0, len(Uc), _GRAM_BLOCK):
            e = min(s + _GRAM_BLOCK, len(Uc))
            G = Uc[s:e] @ Ub.T  # (e-s, nb)
            by_corpus |= ((G > tau_f) & vc[s:e, None] & vb[None, :]).any(axis=0)
        # within-batch dominance, same rank rule as semdedup
        cen = bc.value[cell]
        cn = np.linalg.norm(cen)
        cent_cos = (Ub @ (cen / cn)) if cn > 0 else np.zeros(nb)
        cent_cos = np.where(vb, cent_cos, 0.0)
        order = np.lexsort((idb, cent_cos))
        dom_sorted = _dominated_in_rank_order(Ub[order], vb[order], tau_f)
        by_batch = np.empty(nb, dtype=bool)
        by_batch[order] = dom_sorted
        reason = np.where(by_corpus, "corpus", np.where(by_batch, "batch", None))
        return pd.DataFrame(
            {
                "id": idb,
                "cell": np.full(nb, cell, dtype=np.int32),
                "is_pruned": by_corpus | by_batch,
                "pruned_by": reason,
            }
        )

    return both.groupBy("cell").applyInPandas(prune, _INC_SCHEMA)


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
