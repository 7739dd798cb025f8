"""Product quantization (PQ) ANN: compressed codes + asymmetric distance.

IVF (operators/ivf.py) prunes WHERE to look; PQ shrinks WHAT is scanned.
A D-dim float vector is split into ``m`` subvectors, each quantized to its
nearest of ``ks`` per-subspace centroids (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public method):
the vector becomes ``m`` bytes (ks <= 256). At dim 64 float32 that is
256 B -> 8 B, a 32x compression — the difference between an embedding
corpus that fits in executor memory and one that does not.

Search is **ADC** (asymmetric distance computation): the query stays
exact; per query a lookup table of ``m x ks`` partial dot products is
precomputed, and each corpus vector's approximate similarity is ``m``
table gathers — no float vector is ever decoded. The plan shape:

- **pq_train** — per-subspace Lloyd k-means on a deterministic,
  hash-ordered SAMPLE (bounded driver read, ``sample_cap`` rows): at
  100 TB codebooks are always trained on a sample; the full corpus only
  ever streams through the encoder.
- **pq_encode** — ``mapInPandas`` with the (m, ks, sub) codebook tensor
  as a broadcast variable (same plan-O(1) posture as ivf.py's Arrow
  path): one GEMM per subspace per Arrow batch, codes emitted as
  ``binary`` (the actual compressed layout).
- **pq_adc_topk** — the query set is collected (bounded, same contract
  as similarity.brute_force_topk's broadcast) and shipped as one
  broadcast LUT tensor; each Arrow batch of codes emits its per-query
  top-R partial candidates, and a window rank merges them globally. The
  corpus is never shuffled and never leaves its 1-byte-per-subspace
  representation.
- **pq_search_rerank** — ADC selects ``rerank`` candidates per query,
  then ONLY those rows are re-scored with exact cosine (broadcast
  candidate semi-join; the standard two-stage recall fix). With
  ``rerank >= corpus size`` the result provably equals brute force —
  the driver-checkable invariant registered in plans/llm_vectors.py.

Determinism: sample order and k-means init are xxhash64-ordered (the
ivf.py convention), centroids round to 1e-6 per iteration, and every
candidate selection tie-breaks (score desc, id asc) both in the Arrow
partial top-R and the global window.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.vectors import dot, norm
from .cachereg import track_broadcast

#: training-sample ceiling — the only driver-side read of vector data;
#: 16k x dim 64 float64 = 8 MB
DEFAULT_SAMPLE_CAP = 16384


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ks: int = 16,
    iters: int = 8,
    sample_cap: int = DEFAULT_SAMPLE_CAP,
) -> np.ndarray:
    """Fit the (m, ks, dim/m) codebook tensor on a deterministic sample.

    Plain L2 k-means per subspace (NOT spherical — subvector magnitudes
    carry signal; normalizing them would corrupt the reconstruction).
    Init per subspace = first ``ks`` sample rows in xxhash64 order;
    empty cells keep their previous centroid; centroids round to 1e-6 so
    the tensor is bit-stable run to run."""
    if ks > 256:
        raise ValueError("ks must be <= 256 (codes are 1 byte per subspace)")
    sample_rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .orderBy(F.xxhash64(F.col("_id").cast("string")), F.col("_id"))
        .limit(sample_cap)
        .collect()
    )
    if len(sample_rows) < ks:
        raise ValueError(f"corpus has fewer than ks={ks} vectors")
    sample = np.asarray(
        [np.asarray(r["_v"], dtype="float64") for r in sample_rows]
    )
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    parts = sample.reshape(len(sample), m, sub)
    books = np.empty((m, ks, sub), dtype="float64")
    for j in range(m):
        x = parts[:, j, :]
        cents = x[:ks].copy()
        for _ in range(iters):
            # assign: argmin squared L2 (first-minimum tie-break)
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cell = np.argmin(d, axis=1)
            for c in range(ks):
                mask = cell == c
                if mask.any():
                    cents[c] = np.round(x[mask].mean(axis=0), 6)
        books[j] = cents
    return books


def pq_sample_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ks: int = 16,
) -> np.ndarray:
    """Closed-form (m, ks, dim/m) codebook: codeword ``c`` of subspace
    ``j`` is subvector ``j`` of the corpus's ``c``-th-smallest-id vector
    — sampled-codeword init with ZERO Lloyd iterations (random-sample
    codebooks are the standard k-means init; using them directly is the
    cheap PQ baseline). Every value is copied, not averaged, so the
    tensor is bit-exact from the stored float32s and an external engine
    can recompute it — the ``pq_adc_shortlist`` DuckDB oracle replays
    encode + ADC off this rule (VERDICT r5 item 5)."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .orderBy("_id")
        .limit(ks)
        .collect()
    )
    if len(rows) < ks:
        raise ValueError(f"corpus has fewer than ks={ks} vectors")
    sample = np.asarray([np.asarray(r["_v"], dtype="float64") for r in rows])
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    # (ks, m, sub) -> (m, ks, sub)
    return sample.reshape(ks, m, dim // m).transpose(1, 0, 2).copy()


def _codes_to_matrix(code_series) -> np.ndarray:
    """(n, m) uint8 matrix from a pandas Series of m-byte code blobs."""
    return np.frombuffer(b"".join(code_series), dtype=np.uint8).reshape(
        len(code_series), -1
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(n_id, code[, extra_cols...]) — each vector compressed to ``m``
    bytes (nearest per-subspace centroid ids). Arrow-batched; the codebook
    tensor crosses the wire once per executor as a broadcast (registered
    with the shared cache registry). NULL vectors are dropped (they cannot
    be searched). ``extra_cols`` pass through untouched — the IVF-PQ
    layout threads the coarse cell id alongside the code this way."""
    m, ks, sub = codebooks.shape
    spark = corpus.sparkSession
    bc = track_broadcast(spark.sparkContext.broadcast(codebooks))
    src = corpus.select(
        F.col(id_col).cast("long").alias("n_id"),
        F.col(vec_col).alias("_v"),
        *[F.col(c) for c in extra_cols],
    ).filter(F.col("_v").isNotNull())
    schema = StructType(
        [StructField("n_id", LongType()), StructField("code", BinaryType())]
        + [src.schema[c] for c in extra_cols]
    )
    extras = list(extra_cols)

    def gen(batches):
        import pandas as pd

        cb = bc.value  # (m, ks, sub)
        cb_sq = (cb * cb).sum(axis=2)  # (m, ks)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(
                [np.asarray(x, dtype="float64") for x in pdf["_v"]]
            ).reshape(len(pdf), m, sub)
            codes = np.empty((len(pdf), m), dtype=np.uint8)
            for j in range(m):
                # argmin ||x-c||^2 == argmin -2 x.c + ||c||^2
                s = -2.0 * (v[:, j, :] @ cb[j].T) + cb_sq[j]
                codes[:, j] = np.argmin(s, axis=1).astype(np.uint8)
            out = {"n_id": pdf["n_id"], "code": [c.tobytes() for c in codes]}
            for c in extras:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema)


def _collect_query_matrix(queries, id_col, vec_col):
    """(q_ids int64 sorted asc, (nq, dim) float64 matrix) for the bounded
    query set — the one driver-side read every ADC consumer shares. NULL
    vectors are dropped (they cannot be searched), matching pq_encode /
    probe_cells_df."""
    rows = (
        queries.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .orderBy("_id")
        .collect()
    )
    q_ids = np.asarray([r["_id"] for r in rows], dtype="int64")
    q = np.asarray([np.asarray(r["_v"], dtype="float64") for r in rows])
    return q_ids, q


def _query_luts(queries, codebooks, id_col, vec_col, _collected=None):
    """Driver-side LUT tensors for the (bounded) query set: dot LUT
    (nq, m, ks) and the per-code reconstruction norms (m, ks).
    ``_collected`` (optional) reuses an existing ``_collect_query_matrix``
    result so fused callers collect the query set once."""
    m, ks, sub = codebooks.shape
    q_ids, q = (
        _collected if _collected is not None
        else _collect_query_matrix(queries, id_col, vec_col)
    )
    q_parts = q.reshape(len(q_ids), m, sub) if len(q_ids) else q.reshape(0, m, sub)
    # lut[qi, j, c] = q_sub_j . codebook[j, c]
    lut = np.einsum("qjs,jcs->qjc", q_parts, codebooks)
    q_nrm = np.sqrt((q * q).sum(axis=1)) if len(q_ids) else np.zeros(0)
    code_sq = (codebooks * codebooks).sum(axis=2)  # (m, ks)
    return q_ids, lut, q_nrm, code_sq


def _probe_matrix(q: np.ndarray, centroids, nprobe: int) -> np.ndarray:
    """(nq, nprobe) probed coarse-cell ids, computed on the driver from the
    already-collected query matrix — the same float64 math as
    probe_cells_df's Arrow kernel (unit-normalize with zero-vectors passing
    through, score = -2 u·c + ||c||², stable argsort so equal distances
    keep ascending cell order)."""
    from .ivf import _centroid_matrix

    cm = _centroid_matrix(centroids)
    c_sq = (cm * cm).sum(axis=1)
    if len(q) == 0:
        return np.zeros((0, nprobe), dtype="int64")
    nrm = np.sqrt((q * q).sum(axis=1))
    u = q / np.where(nrm == 0.0, 1.0, nrm)[:, None]
    scores = -2.0 * (u @ cm.T) + c_sq
    return np.argsort(scores, axis=1, kind="stable")[:, : int(nprobe)]


def _fused_adc_partials(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    rerank: int,
    id_col: str,
    vec_col: str,
    centroids=None,
    nprobe: int | None = None,
) -> DataFrame:
    """ONE JVM↔Python crossing for the on-the-fly (``codes is None``)
    search paths (guide §4): encode (+ coarse-assign + probe-prune for
    IVF-PQ) and the ADC partial top-``rerank`` run inside a single
    ``mapInPandas`` kernel over the raw vectors, instead of the stacked
    encode-kernel → (join) → ADC-kernel pipeline that shipped the whole
    corpus through Python twice (three times with the cell-assign kernel).

    Bit-identical to the stacked path: codes are the same per-subspace
    argmin over the same float64 GEMM, cell assignment/probe selection are
    the same unit-normalized score with the same first-minimum/stable-sort
    tie-breaks, ADC scores are the same LUT gathers, and each batch emits
    its complete per-query top-``rerank`` so the global rank window
    downstream selects exactly the same candidate set (per-batch partials
    are a superset of the global top-``rerank`` regardless of batch
    boundaries). Persisted-index paths (``codes`` given) are untouched —
    their corpus never carries vectors."""
    m, ks, sub = codebooks.shape
    spark = corpus.sparkSession
    collected = _collect_query_matrix(queries, id_col, vec_col)
    q_ids, lut, q_nrm, code_sq = _query_luts(
        queries, codebooks, id_col, vec_col, _collected=collected
    )
    if centroids is not None:
        from .ivf import _centroid_matrix

        cmat = _centroid_matrix(centroids)
        probes = _probe_matrix(collected[1], centroids, nprobe)
    else:
        cmat, probes = None, None
    bc = track_broadcast(
        spark.sparkContext.broadcast(
            (q_ids, lut, q_nrm, code_sq, codebooks, cmat, probes)
        )
    )
    src = corpus.select(
        F.col(id_col).cast("long").alias("n_id"), F.col(vec_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    schema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("n_id", LongType()),
            StructField("adc_cos", DoubleType()),
        ]
    )
    rr = int(rerank)

    def gen(batches):
        import pandas as pd

        ids, lt, qn, csq, cb, C, prb = bc.value
        nq = len(ids)
        if nq == 0:
            return
        cb_sq = (cb * cb).sum(axis=2)  # (m, ks)
        c_sq = (C * C).sum(axis=1) if C is not None else None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            flat = np.asarray(
                [np.asarray(x, dtype="float64") for x in pdf["_v"]]
            )
            v = flat.reshape(n, m, sub)
            # encode — pq_encode's exact expression and tie-break
            codes = np.empty((n, m), dtype=np.int64)
            for j in range(m):
                s = -2.0 * (v[:, j, :] @ cb[j].T) + cb_sq[j]
                codes[:, j] = np.argmin(s, axis=1)
            # reconstruction norm² — shared by every query
            rec_sq = np.zeros(n)
            for j in range(m):
                rec_sq += csq[j, codes[:, j]]
            rec_nrm = np.sqrt(rec_sq)
            n_ids = pdf["n_id"].to_numpy()
            if C is not None:
                # coarse assign — assign_cells_df's exact Arrow-kernel math
                nrm = np.sqrt((flat * flat).sum(axis=1))
                u = flat / np.where(nrm == 0.0, 1.0, nrm)[:, None]
                cells = np.argmin(-2.0 * (u @ C.T) + c_sq, axis=1)
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                if C is not None:
                    mask = np.isin(cells, prb[qi]) & (n_ids != ids[qi])
                else:
                    mask = n_ids != ids[qi]
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                dots = np.zeros(len(idx))
                for j in range(m):
                    dots += lt[qi, j, codes[idx, j]]
                denom = qn[qi] * rec_nrm[idx]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom > 0, dots / denom, np.nan)
                keep = ~np.isnan(cos)
                if not keep.any():
                    continue
                kidx, kcos = idx[keep], cos[keep]
                order = np.lexsort((n_ids[kidx], -kcos))[:rr]
                out_q.extend([ids[qi]] * len(order))
                out_n.extend(n_ids[kidx][order])
                out_s.extend(kcos[order])
            if out_q:
                yield pd.DataFrame(
                    {"q_id": out_q, "n_id": out_n, "adc_cos": out_s}
                )

    return src.mapInPandas(gen, schema)


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k from codes alone: (q_id, n_id, adc_cos,
    rank). ``adc_cos`` uses the reconstruction's dot product and norm —
    vectors whose reconstruction has zero norm are skipped (mirrors the
    exact tier's NULL-cos filter). Each Arrow batch emits only its
    per-query top-k; the global window merges the partial winners, so
    driver/shuffle volume is O(batches x nq x k), never corpus-sized."""
    m = codebooks.shape[0]
    spark = codes.sparkSession
    q_ids, lut, q_nrm, code_sq = _query_luts(queries, codebooks, id_col, vec_col)
    bc = track_broadcast(
        spark.sparkContext.broadcast((q_ids, lut, q_nrm, code_sq))
    )
    schema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("n_id", LongType()),
            StructField("adc_cos", DoubleType()),
        ]
    )
    kk = int(k)

    def gen(batches):
        import pandas as pd

        ids, lt, qn, csq = bc.value
        nq = len(ids)
        if nq == 0:
            return
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            cm = _codes_to_matrix(pdf["code"])  # (n, m)
            n_ids = pdf["n_id"].to_numpy()
            dots = np.zeros((nq, n))
            rec_sq = np.zeros(n)
            for j in range(m):
                cj = cm[:, j]
                dots += lt[:, j, :][:, cj]
                rec_sq += csq[j, cj]
            rec_nrm = np.sqrt(rec_sq)
            denom = qn[:, None] * rec_nrm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, np.nan)
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                row = cos[qi]
                valid = ~np.isnan(row)
                valid &= n_ids != ids[qi]  # exclude self
                idx = np.nonzero(valid)[0]
                if len(idx) == 0:
                    continue
                # deterministic partial top-k: (score desc, n_id asc)
                order = idx[np.lexsort((n_ids[idx], -row[idx]))][:kk]
                out_q.extend([ids[qi]] * len(order))
                out_n.extend(n_ids[order])
                out_s.extend(row[order])
            if out_q:
                yield pd.DataFrame(
                    {"q_id": out_q, "n_id": out_n, "adc_cos": out_s}
                )

    partial = codes.mapInPandas(gen, schema)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_cos").desc(), F.col("n_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("adc_cos", 6).alias("adc_cos"), "rank")
    )


def pq_search_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank: int = 50,
    codes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage search: ADC shortlists ``rerank`` candidates per query
    from the compressed codes, then exact cosine re-scores ONLY those
    rows. Returns (q_id, n_id, cos, rank) — the same shape/semantics as
    similarity.brute_force_topk, which it equals whenever the true top-k
    survive the shortlist (guaranteed at rerank >= corpus size).

    ``codes`` may be a pre-encoded/persisted frame (build_pq_index);
    otherwise encode + ADC run fused in ONE ``mapInPandas`` kernel over
    the raw vectors (guide §4 — the stacked encode→ADC pair shipped the
    corpus through Python twice; scores and the candidate set are
    bit-identical, see :func:`_fused_adc_partials`)."""
    if codes is None:
        partial = _fused_adc_partials(
            corpus, queries, codebooks, rerank, id_col, vec_col
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("adc_cos").desc(), F.col("n_id").asc()
        )
        cand = (
            partial.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= rerank)
            .select("q_id", "n_id")
        )
    else:
        cand = pq_adc_topk(codes, queries, codebooks, rerank, id_col, vec_col)
    return _exact_rerank(corpus, queries, cand, k, id_col, vec_col)


def _exact_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine top-k over an ADC shortlist: the (q_id, n_id)
    candidate list is broadcast into the corpus scan (a semi-join keeps
    only shortlisted vectors), queries broadcast as in brute force."""
    c = corpus.select(
        F.col(id_col).cast("long").alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(vec_col).alias("n_nrm"),
    )
    shortlist = c.join(
        F.broadcast(cand.select("q_id", "n_id")), "n_id", "inner"
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_nrm"),
    )
    scored = (
        shortlist.join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "n_id",
            F.try_divide(
                dot("q_vec", "n_vec"), F.col("q_nrm") * F.col("n_nrm")
            ).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[np.ndarray],
    codebooks: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN layout — the coarse quantizer prunes
    WHERE to look (queries probe ``nprobe`` of the k-means cells,
    operators/ivf.py), PQ codes shrink WHAT is scanned there (ADC over
    m-byte codes), and exact cosine re-ranks the ``rerank`` survivors.
    Returns (q_id, n_id, cos, rank) — same shape as brute_force_topk,
    which it provably equals at nprobe = n_cells and rerank >= corpus
    size (tested).

    ``codes`` may be a persisted (n_id, cell, code) frame (see
    build_ivfpq_index); otherwise cells + codes are derived on the fly.
    The probed-candidate join is on the cell id only — the corpus is
    never shuffled by query, and at scale the cell column is the
    partition directory, so probing 2 of 256 cells reads 2/256 of the
    files AND scans them at 1/16 the bytes."""
    from .ivf import probe_cells_df

    m = codebooks.shape[0]
    if codes is None:
        # on-the-fly path: coarse-assign + encode + probe-prune + ADC
        # fused into ONE Python crossing over the raw vectors (guide §4)
        # — the stacked assign-kernel → encode-kernel → probe-join →
        # ADC-kernel pipeline shipped the corpus through Python three
        # times and fanned code rows out per probing query. Scores and
        # the candidate set are bit-identical (_fused_adc_partials).
        scored = _fused_adc_partials(
            corpus, queries, codebooks, rerank, id_col, vec_col,
            centroids=centroids, nprobe=nprobe,
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("adc_cos").desc(), F.col("n_id").asc()
        )
        cand = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= rerank)
            .select("q_id", "n_id")
        )
        return _exact_rerank(corpus, queries, cand, k, id_col, vec_col)
    probes = probe_cells_df(queries, centroids, nprobe, id_col, vec_col)
    cand_codes = (
        codes.join(
            F.broadcast(probes.select(F.col("q_id").cast("long").alias("q_id"), "cell")),
            "cell",
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "code")
    )
    spark = codes.sparkSession
    q_ids, lut, q_nrm, code_sq = _query_luts(queries, codebooks, id_col, vec_col)
    bc = track_broadcast(
        spark.sparkContext.broadcast((q_ids, lut, q_nrm, code_sq))
    )
    schema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("n_id", LongType()),
            StructField("adc_cos", DoubleType()),
        ]
    )

    rr = int(rerank)

    def gen(batches):
        import pandas as pd

        ids, lt, qn, csq = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0 or len(ids) == 0:
                continue
            qnp = pdf["q_id"].to_numpy()
            qpos = np.searchsorted(ids, qnp)
            # guard: a probed q_id can be absent from the LUT set (NULL-
            # vector query — probe rows exist, LUT rows don't); drop those
            # rows instead of misindexing another query's table
            in_lut = (qpos < len(ids)) & (
                ids[np.minimum(qpos, len(ids) - 1)] == qnp
            )
            if not in_lut.all():
                pdf = pdf[in_lut].reset_index(drop=True)
                n = len(pdf)
                if n == 0:
                    continue
                qnp = qnp[in_lut]
                qpos = qpos[in_lut]
            cm = _codes_to_matrix(pdf["code"])  # (n, m)
            dots = np.zeros(n)
            rec_sq = np.zeros(n)
            for j in range(m):
                cj = cm[:, j]
                dots += lt[qpos, j, cj]
                rec_sq += csq[j, cj]
            denom = qn[qpos] * np.sqrt(rec_sq)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, np.nan)
            keep = ~np.isnan(cos)
            if not keep.any():
                continue
            # per-batch partial top-rerank PER QUERY (score desc, n_id
            # asc) — the same truncation pq_adc_topk applies, so the
            # downstream q_id window shuffles O(batches x nq x rerank)
            # rows, never the candidate-set size
            n_ids = pdf["n_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi in np.unique(qnp[keep]):
                idx = np.nonzero(keep & (qnp == qi))[0]
                order = idx[np.lexsort((n_ids[idx], -cos[idx]))][:rr]
                out_q.extend([qi] * len(order))
                out_n.extend(n_ids[order])
                out_s.extend(cos[order])
            yield pd.DataFrame(
                {"q_id": out_q, "n_id": out_n, "adc_cos": out_s}
            )

    scored = cand_codes.mapInPandas(gen, schema)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_cos").desc(), F.col("n_id").asc()
    )
    cand = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank)
        .select("q_id", "n_id")
    )
    return _exact_rerank(corpus, queries, cand, k, id_col, vec_col)


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    cell_iters: int = 5,
    m: int = 8,
    ks: int = 16,
    pq_iters: int = 8,
    max_train_rows: int | None | str = "auto",
) -> tuple[list[np.ndarray], np.ndarray]:
    """Materialize the IVF-PQ layout: ``{path}/codes`` holds (n_id, code)
    partitioned by cell directory (probe pruning = partition pruning at
    1/16 the bytes), ``{path}/centroids`` and ``{path}/codebooks`` hold
    the two quantizers. Returns (centroids, codebooks)."""
    from .ivf import assign_cells_df, cluster_for_cell_write, kmeans_centroids

    spark = corpus.sparkSession
    centroids = kmeans_centroids(
        corpus, vec_col, id_col, n_cells, cell_iters, max_train_rows=max_train_rows
    )
    books = pq_train(corpus, vec_col, id_col, m, ks, pq_iters)
    with_cells = assign_cells_df(corpus, centroids, vec_col=vec_col)
    (
        cluster_for_cell_write(
            pq_encode(with_cells, books, vec_col, id_col, extra_cols=("cell",))
        )
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )
    spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "j int, c int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    return centroids, books


def append_to_ivfpq_index(
    spark,
    path: str,
    batch: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Incremental-ingest leg of the IVF-PQ lifecycle (parity with
    ``ivf.append_to_ivf_index``): assign an arriving batch against the
    index's FIXED coarse centroids, encode it with the FIXED codebooks,
    and append the m-byte codes to the cell-partitioned ``{path}/codes``
    layout — cost ∝ batch; neither quantizer refits (refitting would
    move cell boundaries / code meanings out from under every
    already-written row).

    Replay guard: ids already present in the touched ``cell=``
    directories are skipped, and ids repeated WITHIN the batch collapse
    first — at-least-once ingest retries converge, and an appended index
    answers searches identically to a fresh build over the union (the
    equivalence the tests pin).

    Quantizer drift is the documented limit, doubly so here: distribution
    shift degrades BOTH the coarse cells (skewed ``cell=`` row counts)
    and the codebooks (rising ADC reconstruction error on new batches) —
    rebuild via ``build_ivfpq_index`` when either signal moves. Returns
    {n_batch, n_appended, n_replayed}."""
    from .ivf import assign_cells_df, cluster_for_cell_write

    _codes_tbl, centroids, books = load_ivfpq_index(spark, path)
    src = (
        batch.filter(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
        .dropDuplicates([id_col])
    )
    with_cells = assign_cells_df(src, centroids, vec_col=vec_col)
    encoded = pq_encode(with_cells, books, vec_col, id_col, extra_cols=("cell",)).persist()
    try:
        n_batch = encoded.count()
        touched = encoded.select("cell").distinct()
        existing = (
            spark.read.parquet(f"{path}/codes")
            .join(F.broadcast(touched), "cell", "left_semi")
            .select("n_id")
        )
        fresh = encoded.join(existing, "n_id", "left_anti").persist()
        try:
            n_new = fresh.count()
            if n_new:
                (
                    cluster_for_cell_write(fresh)
                    .write.partitionBy("cell")
                    .mode("append")
                    .parquet(f"{path}/codes")
                )
        finally:
            fresh.unpersist(blocking=True)
    finally:
        encoded.unpersist(blocking=True)
    return {
        "n_batch": int(n_batch),
        "n_appended": int(n_new),
        "n_replayed": int(n_batch - n_new),
    }


# --------------------------------------------------------------------------
# Index lifecycle: train/encode once at ingest, persist, query many times
# (parity with build_ivf_index).
# --------------------------------------------------------------------------
def build_pq_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ks: int = 16,
    iters: int = 8,
) -> np.ndarray:
    """Materialize a PQ index: ``{path}/codes`` (n_id, code binary) and
    ``{path}/codebooks`` ((j, c, centroid) rows). The codes table is the
    searchable corpus at 1/32 the footprint; re-encoding an ingest batch
    appends without touching history."""
    spark = corpus.sparkSession
    books = pq_train(corpus, vec_col, id_col, m, ks, iters)
    pq_encode(corpus, books, vec_col, id_col).write.mode("overwrite").parquet(
        f"{path}/codes"
    )
    rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(m)
        for c in range(ks)
    ]
    spark.createDataFrame(
        rows, "j int, c int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    return books


def load_ivfpq_index(
    spark, path: str
) -> tuple[DataFrame, list[np.ndarray], np.ndarray]:
    """(codes frame incl. cell partition column, centroid list, codebook
    tensor) from a build_ivfpq_index directory. Bounded reads: n_cells
    centroid rows + m x ks codebook rows."""
    from .ivf import load_centroids

    codes, books = load_pq_index(spark, path)
    return codes, load_centroids(spark, path), books


def load_pq_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """(codes frame, codebook tensor) from a build_pq_index directory.
    Codebook read is bounded: m x ks rows."""
    codes = spark.read.parquet(f"{path}/codes")
    rows = spark.read.parquet(f"{path}/codebooks").orderBy("j", "c").collect()
    m = max(r["j"] for r in rows) + 1
    ks = max(r["c"] for r in rows) + 1
    sub = len(rows[0]["centroid"])
    books = np.zeros((m, ks, sub), dtype="float64")
    for r in rows:
        books[r["j"], r["c"]] = np.asarray(r["centroid"], dtype="float64")
    return codes, books


def pq_reconstruction_error(
    batch: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Codebook-drift monitor — the companion signal to
    ``ivf.ivf_cell_stats`` for the PQ tier: mean / p95 squared
    reconstruction error of ``batch`` under the FIXED codebooks
    (encode + decode distance, computed in the same Arrow kernel shape
    as pq_encode; one pass, two doubles per row leave the executors).

    Track the mean per ingest batch: a fresh codebook fit sits at its
    training error; sustained growth means arriving vectors no longer
    match the frozen subspace centroids — rebuild via build_pq_index /
    build_ivfpq_index. Returns {n, mean_sq_err, p95_sq_err}.
    """
    m, ks, sub = codebooks.shape
    spark = batch.sparkSession
    bc = track_broadcast(spark.sparkContext.broadcast(codebooks))
    src = batch.select(
        F.col(id_col).cast("long").alias("n_id"), F.col(vec_col).alias("_v")
    ).filter(F.col("_v").isNotNull())

    schema = StructType([StructField("n_id", LongType()), StructField("err", DoubleType())])

    def gen(batches):
        import pandas as pd

        cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(
                [np.asarray(x, dtype="float64") for x in pdf["_v"]]
            ).reshape(len(pdf), m, sub)
            err = np.zeros(len(pdf), dtype="float64")
            cb_sq = (cb * cb).sum(axis=2)
            for j in range(m):
                s = -2.0 * (v[:, j, :] @ cb[j].T) + cb_sq[j]
                pick = np.argmin(s, axis=1)
                diff = v[:, j, :] - cb[j][pick]
                err += (diff * diff).sum(axis=1)
            yield pd.DataFrame({"n_id": pdf["n_id"], "err": err})

    errs = src.mapInPandas(gen, schema)
    row = errs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("err").alias("mean"),
        F.expr("percentile_approx(err, 0.95)").alias("p95"),
    ).collect()[0]  # 1 row
    return {
        "n": int(row["n"]),
        "mean_sq_err": float(row["mean"]) if row["n"] else 0.0,
        "p95_sq_err": float(row["p95"]) if row["n"] else 0.0,
    }
