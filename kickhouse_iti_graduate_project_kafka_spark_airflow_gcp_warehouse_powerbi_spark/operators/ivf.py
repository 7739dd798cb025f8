"""IVF-Flat ANN with a real k-means coarse quantizer + multi-probe.

Replaces the label-borrowing stand-in (similarity.partitioned_topk with a
pre-existing cluster column) with the production shape:

1. **kmeans_centroids** — Lloyd iterations expressed as DataFrame ops:
   assignment is a JVM-side argmin over k dot-product expressions (one
   ndarray literal per centroid — the hyperplane-LSH trick, so the column
   tree is O(k) regardless of dim); the update step is an elementwise mean
   via ``posexplode`` + ``groupBy(cell, pos)`` (map-side partial
   aggregation, one shuffle of (cell, pos) keys per iteration). Only the
   k x dim centroid matrix ever reaches the driver — the corpus does not.
   Centroids are rounded to 1e-6 each iteration so run-to-run float
   summation-order drift cannot flip assignments (determinism is what the
   driver's repeated checks need).
2. **assign_cells** — the argmin assignment as a reusable Column; at 100 TB
   this is the physical partition / bucket key of the vector table.
3. **ivf_topk** — queries probe their ``nprobe`` nearest cells (classic
   multi-probe recall knob) and score exactly within the probed cells:
   shuffle on the cell id only, never an all-pairs join.

At petabyte scale the centroid fit runs on a sample (one pass) and the
assignment is written at ingest; the operators separate fit (kmeans_
centroids) from transform (assign_cells) for exactly that reason.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, norm


def _unit(vec_col: str | Column) -> Column:
    """Unit-normalized copy of the vector (zero vectors pass through):
    clustering on the unit sphere makes L2 cells equivalent to cosine
    cells (spherical k-means) — required when search similarity is cosine,
    or neighbors with different magnitudes land in different cells."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    n = norm(c)
    return F.when(n == 0, c).otherwise(
        F.transform(c, lambda x: x.cast("double") / n)
    )


def cluster_for_cell_write(df: DataFrame, order: tuple[str, ...] = ("cell", "n_id")) -> DataFrame:
    """Cluster rows by cell id before a ``partitionBy("cell")`` parquet write.

    Preserving the input partitioning (the pre-r12 behavior) writes one
    file per (task × cell): at the sf100 bench point (2M vectors, ~2000
    sqrt-geometry cells) that exploded into ~10^5 tiny files and the IVF
    append leg spent 824 s mostly on file-commit overhead. An AQE
    rebalance on the cell column pays one batch-sized shuffle and makes
    file count track data volume instead: small cells collapse into one
    file each, and a skewed cell splits into advisory-size chunks
    (optimizeSkewsInRebalancePartitions) rather than one giant file. The
    within-partition sort keeps every file a sorted run on ``order`` for
    parquet row-group min/max skipping within a cell directory.
    """
    return df.hint("rebalance", "cell").sortWithinPartitions(*order)


def _dot_lit(vec_col: str | Column, centroid: np.ndarray) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(c, F.lit(centroid), lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _score_array(vec_col: str | Column, centroids: list[np.ndarray]) -> Column:
    """array of -2*v.c + ||c||^2 per centroid — rank-equivalent to squared
    L2 distance (||v||^2 is constant per row) at half the arithmetic."""
    return F.array(
        *[
            (_dot_lit(vec_col, c) * -2.0 + float(c @ c)).alias(f"_s{j}")
            for j, c in enumerate(centroids)
        ]
    )


def assign_cells(vec_col: str | Column, centroids: list[np.ndarray]) -> Column:
    """Nearest-centroid cell id (int, 0-based). Ties break to the lowest
    cell id (array_position returns the first match)."""
    scores = _score_array(vec_col, centroids)
    return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")


#: Above this centroid count the plan-literal argmin becomes the bottleneck
#: (k ndarray literals per query plan: analysis cost and plan size grow
#: O(k x dim)); the Arrow path ships the centroid matrix ONCE per executor
#: as a broadcast variable instead.
ARROW_CELL_THRESHOLD = 64

#: ...and independent of k, the LITERAL COUNT k x dim is what the engine
#: actually evaluates per row — and zip_with/aggregate score expressions
#: run on Catalyst's INTERPRETED higher-order-function path, not codegen:
#: measured at sf0.1 (2 000 x dim 64), assignment at k=16 (k x dim = 1024)
#: costs 12.9 s literal vs 0.47 s Arrow, and k-means(16 cells, 3 iters)
#: 13.8 s vs 5.7 s. The literal path only pays off when the score array is
#: small enough that skipping the Python-worker round-trip wins (tiny toy
#: frames, k x dim in the low hundreds), hence this budget.
LITERAL_SCORE_BUDGET = 256


def _use_literal_path(centroids: list[np.ndarray]) -> bool:
    k = len(centroids)
    dim = int(np.asarray(centroids[0]).shape[0]) if centroids else 0
    return k <= ARROW_CELL_THRESHOLD and k * dim <= LITERAL_SCORE_BUDGET


def _centroid_matrix(centroids: list[np.ndarray]) -> np.ndarray:
    return np.stack([np.asarray(c, dtype="float64") for c in centroids])


def assign_cells_df(
    df: DataFrame,
    centroids: list[np.ndarray],
    vec_col: str = "embedding",
    out_col: str = "cell",
    normalize: bool = True,
    _bc_holder: list | None = None,
) -> DataFrame:
    """Append the nearest-centroid cell id, choosing the physical strategy
    by PLAN SIZE, not centroid count alone:

    - ``k <= ARROW_CELL_THRESHOLD`` AND ``k x dim <= LITERAL_SCORE_BUDGET``:
      plan-literal argmin (whole-stage codegen, zero Python in the row
      path) — fastest at small k x dim.
    - otherwise: ``mapInPandas`` consuming the k x dim centroid matrix from
      a **broadcast variable** — the plan stays O(1) in k, the matrix
      crosses the wire once per executor, and the batch scoring is one
      BLAS GEMM per Arrow batch. This is the path that lets production
      cell counts (256-65536) scale: plan-literal centroids at k=256 and
      dim=1536 would put ~400k doubles into every query plan.

    Both paths compute the same score (-2 v·c + ||c||²) on float64 with
    first-minimum tie-break; k-means centroids are rounded to 1e-6 per
    iteration precisely so summation-order differences between codegen
    and BLAS cannot flip an assignment.

    ``normalize=False`` skips unit normalization when ``vec_col`` is
    already unit-length (the k-means inner loop).

    NULL vectors are dropped on BOTH paths — a row without a vector has
    no cell (previously the literal path kept it with a NULL cell that
    every downstream cell join/group silently discarded, while the Arrow
    kernel crashed on the ragged batch; explicit and identical is
    better).

    The Arrow path's broadcast is registered with the shared cache
    registry (released by ``release_tracked``/``clear_all_caches`` via
    ``unpersist`` — executors drop their copy, a later re-execution
    re-fetches from the driver). ``_bc_holder`` (internal) additionally
    hands the broadcast to callers that manage a tighter lifecycle, e.g.
    the k-means loop releasing each iteration's matrix as soon as its
    means are collected.
    """
    df = df.filter(F.col(vec_col).isNotNull())
    if _use_literal_path(centroids):
        vec = _unit(vec_col) if normalize else F.col(vec_col)
        return df.withColumn(out_col, assign_cells(vec, centroids))

    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(_centroid_matrix(centroids))
    if _bc_holder is not None:
        # caller owns the lifecycle (the k-means loop releases each
        # iteration's matrix right after its means collect) — registering
        # in the shared registry too would accumulate dead handles
        _bc_holder.append(bc)
    else:
        from .cachereg import track_broadcast

        track_broadcast(bc)
    cols = df.columns
    # a fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema object and corrupt df.columns
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )

    def gen(batches):
        cm = bc.value
        c_sq = (cm * cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = np.array([], dtype="int32")
                yield pdf[cols + [out_col]]
                continue
            v = np.asarray(
                [np.asarray(x, dtype="float64") for x in pdf[vec_col]]
            )
            if normalize:
                nrm = np.sqrt((v * v).sum(axis=1))
                v = v / np.where(nrm == 0.0, 1.0, nrm)[:, None]
            scores = -2.0 * (v @ cm.T) + c_sq
            # np.argmin returns the FIRST minimal index — same tie-break
            # as array_position on the literal path
            pdf[out_col] = np.argmin(scores, axis=1).astype("int32")
            yield pdf[cols + [out_col]]

    return df.mapInPandas(gen, schema)


def probe_cells_df(
    queries: DataFrame,
    centroids: list[np.ndarray],
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query probe list: (q_id, q_vec, q_nrm, cell) rows for the
    ``nprobe`` nearest cells, ordered ties-to-lowest-cell. Same dual
    strategy as :func:`assign_cells_df` — plan-literal score array +
    window at small k x dim, broadcast matrix + ``mapInPandas`` beyond
    the literal-plan budget (argsort is stable, so equal distances keep
    ascending cell order, matching the window's (dist, cell) sort).
    NULL-vector queries probe nothing (dropped, as in assign_cells_df —
    the literal path previously emitted arbitrary NULLS-FIRST probe rows
    for them, the Arrow kernel crashed)."""
    queries = queries.filter(F.col(vec_col).isNotNull())
    if _use_literal_path(centroids):
        q_scored = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(vec_col).alias("q_nrm"),
            F.posexplode(_score_array(_unit(vec_col), centroids)).alias(
                "cell", "_dist"
            ),
        )
        probe_w = Window.partitionBy("q_id").orderBy(
            F.col("_dist").asc(), F.col("cell").asc()
        )
        return (
            q_scored.withColumn("_pr", F.row_number().over(probe_w))
            .filter(F.col("_pr") <= nprobe)
            .select("q_id", "q_vec", "q_nrm", "cell")
        )

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from .cachereg import track_broadcast

    spark = queries.sparkSession
    bc = track_broadcast(spark.sparkContext.broadcast(_centroid_matrix(centroids)))
    src = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    vec_field = src.schema["q_vec"]
    schema = StructType(
        [
            src.schema["q_id"],
            StructField("q_vec", vec_field.dataType),
            StructField("q_nrm", DoubleType()),
            StructField("cell", IntegerType()),
        ]
    )
    np_probe = int(nprobe)

    def gen(batches):
        import pandas as pd

        cm = bc.value
        c_sq = (cm * cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(
                [np.asarray(x, dtype="float64") for x in pdf["q_vec"]]
            )
            nrm = np.sqrt((v * v).sum(axis=1))
            u = v / np.where(nrm == 0.0, 1.0, nrm)[:, None]
            scores = -2.0 * (u @ cm.T) + c_sq
            order = np.argsort(scores, axis=1, kind="stable")[:, :np_probe]
            n, p = order.shape
            yield pd.DataFrame(
                {
                    "q_id": pdf["q_id"].to_numpy().repeat(p),
                    "q_vec": [x for x in pdf["q_vec"] for _ in range(p)],
                    "q_nrm": nrm.repeat(p),
                    "cell": order.reshape(-1).astype("int32"),
                }
            )

    return src.mapInPandas(gen, schema)


#: Default training budget (``max_train_rows="auto"``): FAISS-style
#: per-centroid cap (max_points_per_centroid=256) under a hard engine-wide
#: ceiling — the same 8192 the catalog queries pass explicitly. Bounded
#: training is the documented 100 TB posture; r9 measured the sf1 build
#: at 25.6 s full-corpus vs 16.0 s sampled with identical invariants.
TRAIN_PER_CELL = 256
TRAIN_CEIL = 8192


def _auto_train_cap(n_cells: int) -> int:
    return min(TRAIN_PER_CELL * n_cells, TRAIN_CEIL)


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    iters: int = 5,
    round_decimals: int = 6,
    max_train_rows: int | None | str = "auto",
) -> list[np.ndarray]:
    """Fit k-means cell centroids with Lloyd iterations on DataFrames.

    Deterministic: init picks the ``n_cells`` vectors with the smallest
    ``xxhash64(id)`` (a seeded pseudo-random spread, reproducible with zero
    stored state); every update rounds to ``round_decimals`` so partition
    summation order cannot leak into the result. Empty cells keep their
    previous centroid.

    ``max_train_rows`` is the corpus-scale lever (the r9 ladder measured
    full-corpus training as the ONE ~linear index leg, and its N x cells
    assignment term is quadratic once cells grow with N): when the corpus
    exceeds it, Lloyd runs on a deterministic hash-threshold sample of
    ~that many rows (one narrow filter — no sort, no shuffle — cached
    across iterations). FAISS trains IVF coarse quantizers the same way
    (bounded training set regardless of corpus size); centroid quality
    needs a representative sample, not every row.

    ``"auto"`` (the default since r10) resolves the cap to
    ``min(256 * n_cells, 8192)`` so training stays bounded at ANY corpus
    size without the caller thinking about it; pass ``None`` to reach
    the exact full-corpus fit explicitly, or an int to pick your own cap.
    """
    if isinstance(max_train_rows, str):
        # fail fast on 'Auto'/'full'/etc — a non-'auto' string would fall
        # through to `n > max_train_rows` and die with an opaque TypeError
        # only after a full corpus count (mirrors on_truncated validation)
        if max_train_rows != "auto":
            raise ValueError(
                "max_train_rows must be 'auto', an int cap, or None "
                f"(got {max_train_rows!r})"
            )
        max_train_rows = _auto_train_cap(n_cells)
    sampled = False
    if max_train_rows:
        n = corpus.count()
        if n > max_train_rows:
            buckets = 1 << 20
            keep = max(1, (max_train_rows * buckets) // n)
            corpus = corpus.filter(
                F.pmod(
                    F.xxhash64(
                        F.concat(
                            F.lit("ivf-train:"), F.col(id_col).cast("string")
                        )
                    ),
                    F.lit(buckets),
                )
                < keep
            ).persist()
            sampled = True
    init_rows = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), _unit(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id").cast("string")), F.col("_id"))
        .limit(n_cells)
        .collect()
    )
    centroids = [np.asarray(r["_v"], dtype="float64") for r in init_rows]
    if len(centroids) < n_cells:
        raise ValueError(f"corpus has fewer than {n_cells} vectors")

    # ONE narrow job per Lloyd iteration: an Arrow kernel normalizes,
    # assigns, and emits per-partition partial sums (cell, count, Σvec) —
    # at most n_partitions x k tiny rows reach the driver, no shuffle at
    # all. (The previous posexplode → groupBy(cell, pos) shuffle plus an
    # interpreted `_unit` re-evaluated per iteration cost ~1.9 s/iter at
    # sf0.1 in pure overhead.) Rounding the combined means absorbs
    # partial-sum ordering, exactly as it absorbed partition summation
    # order before.
    vecs = corpus.select(F.col(vec_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    spark = corpus.sparkSession
    k = n_cells
    partial_schema = "cell int, cnt long, sums array<double>"
    for _ in range(iters):
        cmat = _centroid_matrix(centroids)
        bc = spark.sparkContext.broadcast(cmat)

        def partials(batches):
            import pandas as pd

            C = bc.value
            dim = C.shape[1]
            c_sq = (C * C).sum(axis=1)
            cnt = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
                n = np.linalg.norm(V, axis=1)
                U = np.divide(
                    V, n[:, None], out=V.copy(), where=(n > 0)[:, None]
                )  # zero vectors pass through, matching _unit
                cells = np.argmin(-2.0 * (U @ C.T) + c_sq, axis=1)
                cnt += np.bincount(cells, minlength=k)
                np.add.at(sums, cells, U)
            hit = np.nonzero(cnt)[0]
            if len(hit):
                yield pd.DataFrame(
                    {
                        "cell": hit.astype(np.int32),
                        "cnt": cnt[hit],
                        "sums": [sums[j] for j in hit],
                    }
                )

        rows = vecs.mapInPandas(partials, partial_schema).collect()
        bc.unpersist(blocking=False)
        tot_cnt = np.zeros(k, dtype=np.int64)
        tot_sum: dict[int, np.ndarray] = {}
        for r in rows:
            j = r["cell"]
            tot_cnt[j] += r["cnt"]
            s = np.asarray(r["sums"], dtype="float64")
            tot_sum[j] = tot_sum.get(j, 0.0) + s
        centroids = [
            np.round(tot_sum[j] / tot_cnt[j], round_decimals)
            if tot_cnt[j]
            else prev  # empty cell: keep previous centroid
            for j, prev in enumerate(centroids)
        ]
    if sampled:
        corpus.unpersist(blocking=True)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[np.ndarray],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat search: each query scores ONLY the corpus rows whose cell is
    among its ``nprobe`` nearest centroids. Exact cosine within the probed
    cells; recall grows with nprobe (nprobe = n_cells degenerates to brute
    force). Returns (q_id, n_id, cos, rank)."""
    c = assign_cells_df(
        corpus.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            norm(vec_col).alias("n_nrm"),
        ),
        centroids,
        vec_col="n_vec",
    )
    probes = probe_cells_df(queries, centroids, nprobe, id_col, vec_col)
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.try_divide(dot("q_vec", "n_vec"), F.col("q_nrm") * F.col("n_nrm")).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


# --------------------------------------------------------------------------
# Index lifecycle: fit/assign once at ingest, persist, query many times.
# --------------------------------------------------------------------------
def build_ivf_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    iters: int = 5,
    max_train_rows: int | None | str = "auto",
) -> list[np.ndarray]:
    """Materialize an IVF index: ``{path}/vectors`` holds the corpus
    partitioned by cell id (with per-vector norms precomputed), and
    ``{path}/centroids`` holds the k x dim centroid matrix as rows.

    Partitioning by cell is the point: a query probing 2 of 256 cells
    touches 2/256 of the files — the directory layout IS the index. The
    cell column also makes the scan's partition filter visible to dynamic
    partition pruning when the probe list arrives via a broadcast join.
    """
    spark = corpus.sparkSession
    centroids = kmeans_centroids(
        corpus, vec_col, id_col, n_cells, iters, max_train_rows=max_train_rows
    )
    (
        cluster_for_cell_write(
            assign_cells_df(
                corpus.select(
                    F.col(id_col).alias("n_id"),
                    F.col(vec_col).alias("n_vec"),
                    norm(vec_col).alias("n_nrm"),
                ),
                centroids,
                vec_col="n_vec",
            )
        )
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/vectors")
    )
    spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def append_to_ivf_index(
    spark,
    path: str,
    batch: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Incremental-ingest leg of the IVF lifecycle: assign an arriving
    batch against the index's FIXED centroids and append the rows to the
    cell-partitioned layout — cost ∝ batch, the corpus is never re-read
    or re-fitted (refitting would move cell boundaries out from under
    every already-written row). Ids already present in the touched cells
    are skipped, so at-least-once ingest retries converge (same
    replay-guard shape as streaming/semdedup_stream.py: a replayed id
    always lands in the same cell, so the guard reads only touched
    ``cell=`` directories). Returns {n_batch, n_appended, n_replayed}.

    Centroid drift is the operator's documented limit: after enough
    distribution shift, rebuild (``build_ivf_index``) rather than append
    — cell-size skew from `{path}/vectors` row counts is the signal."""
    centroids = load_centroids(spark, path)
    # ids repeated WITHIN the batch (at-least-once duplicate deliveries)
    # must collapse here — the anti-join only guards against the stored
    # index, and a doubled id would otherwise be appended twice, breaking
    # the appended ≡ fresh-build equivalence forever; a NULL-casting id
    # would bypass the guard on EVERY retry (NULL never joins)
    src = (
        batch.select(
            F.col(id_col).cast("long").alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            norm(vec_col).alias("n_nrm"),
        )
        .filter(F.col("n_vec").isNotNull() & F.col("n_id").isNotNull())
        .dropDuplicates(["n_id"])
    )
    # batch-sized persists: count, replay guard, and the write all reuse
    # the assignment instead of re-running the Arrow kernel per action
    assigned = assign_cells_df(src, centroids, vec_col="n_vec").persist()
    try:
        n_batch = assigned.count()
        touched = assigned.select("cell").distinct()
        existing = (
            spark.read.parquet(f"{path}/vectors")
            .join(F.broadcast(touched), "cell", "left_semi")
            .select("n_id")
        )
        fresh = assigned.join(existing, "n_id", "left_anti").persist()
        try:
            n_new = fresh.count()
            if n_new:
                (
                    cluster_for_cell_write(fresh)
                    .write.partitionBy("cell")
                    .mode("append")
                    .parquet(f"{path}/vectors")
                )
        finally:
            fresh.unpersist(blocking=True)
    finally:
        assigned.unpersist(blocking=True)
    return {
        "n_batch": n_batch,
        "n_appended": n_new,
        "n_replayed": n_batch - n_new,
    }


def load_centroids(spark, path: str) -> list[np.ndarray]:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    return [np.asarray(r["centroid"], dtype="float64") for r in rows]


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat search against a persisted index: cell assignment and norms
    come from the index files (written once at ingest), so the query-time
    cost is probe-list computation (k dot products per query, driver-free)
    plus a broadcast join that lets dynamic partition pruning skip every
    unprobed ``cell=`` directory. Results are identical to ``ivf_topk``
    with the same centroids."""
    centroids = load_centroids(spark, path)
    c = spark.read.parquet(f"{path}/vectors")
    probes = probe_cells_df(queries, centroids, nprobe, id_col, vec_col)
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.try_divide(dot("q_vec", "n_vec"), F.col("q_nrm") * F.col("n_nrm")).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def ivf_cell_stats(spark, path: str, table: str = "vectors") -> dict:
    """Index-health monitor — the rebuild signal append_to_ivf_index
    documents, as a concrete operator: per-cell row counts from the
    cell-partitioned layout (one partition-column aggregate — the scan
    reads no vector bytes), summarized as

    - ``n_cells`` / ``n_rows`` / ``n_empty_cells`` (cells in the centroid
      table with no stored rows),
    - ``max_cell`` / ``mean_cell`` and ``skew_ratio`` = max/mean (i.e.
      the hottest cell's multiple of its fair share; bounded by n_cells)
      — the headline number: a fresh k-means build sits near 1-3;
      sustained growth means arriving data no longer matches the frozen
      centroids,
    - ``rebuild_hint`` — True when the hottest cell exceeds 4x its fair
      share (skew_ratio > 4) or >25% of cells are empty (conservative
      defaults; thresholds are policy, the numbers are the contract).

    Works on any cell-partitioned index dir: the IVF ``vectors`` table
    (default) or the IVF-PQ ``codes`` table (``table="codes"``).
    """
    counts = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(f"{path}/{table}")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: one row per cell
    }
    n_cells = spark.read.parquet(f"{path}/centroids").count()
    n_rows = sum(counts.values())
    n_empty = n_cells - len(counts)
    max_cell = max(counts.values()) if counts else 0
    mean_cell = (n_rows / n_cells) if n_cells else 0.0
    skew = (max_cell / mean_cell) if mean_cell else 0.0
    return {
        "n_cells": int(n_cells),
        "n_rows": int(n_rows),
        "n_empty_cells": int(n_empty),
        "max_cell": int(max_cell),
        "mean_cell": round(mean_cell, 3),
        "skew_ratio": round(skew, 3),
        "rebuild_hint": bool(skew > 4.0 or (n_cells and n_empty / n_cells > 0.25)),
    }
