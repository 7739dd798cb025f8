"""Full ingest pipeline — one document/embedding stream through EVERY
ingest stage, in order, as a single per-batch driver:

1. ``quality``       — classifier gate (stateless, exact integer sign
                       test, ``operators/quality.py``)
2. ``dedup_absorb``  — exact + near-dup gate; the dedup index grows with
                       accepted docs (bootstrap: empty-corpus build)
3. ``bm25_append``   — accepted docs into the BM25 index (bootstrap:
                       empty build; term_buckets fixed at bootstrap)
4. ``hll``           — per-day distinct-doc HLL maintenance
                       (replay-idempotent register max)
5. ``countmin``      — source-frequency count-min maintenance
                       (batch-id exactly-once)
6. ``semdedup``      — embedding batch vs the survivors corpus under the
                       IVF-PQ index's FROZEN coarse quantizer (shared
                       quantizer, the ingest_gate discipline)
7. ``ivf_append``    — every ingested vector into the IVF-Flat index
8. ``ivfpq_append``  — and into the IVF-PQ compressed index

Stages 1-5 are the DOCUMENT leg (``docs_leg``); 6-8 the EMBEDDING leg
(``emb_leg``). ``ingest_pipeline_batch`` runs both for the batch driver;
``maintain_pipeline_streams`` wires each leg into its own ``foreachBatch``
stream — the one-transform-two-drivers discipline the other streaming
modules follow.

Crash posture is the UNION of the stages' own postures — the driver adds
NO transaction log of its own. Every stage is individually
replay-convergent (fingerprint commit gate, doclen id registry,
register-max idempotence, batch-id watermark, survivors cell-pruned id
guard, per-cell code id guard), so the pipeline's at-least-once retry
discipline is simply: re-run the WHOLE batch from stage 1; each stage
skips what it already owns. ``tests/test_pipeline_soak.py`` drives a
crash at every inter-stage boundary of every batch and checks the final
state of all four indexes + both sketches + the survivors table against
a crash-free run and against batch-built equivalents.

``fail_after`` (a stage name) injects a crash at that stage's BOUNDARY —
after the stage completes, before the next starts. It exists for the
soak test and for ops drills (``jobs/ingest_gate.py pipeline
--crash-after``); production callers leave it None.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

DOC_STAGES = (
    "quality",
    "dedup_absorb",
    "bm25_append",
    "hll",
    "countmin",
    "parts_land",
)
EMB_STAGES = ("semdedup", "ivf_append", "ivfpq_append")
STAGES = DOC_STAGES + EMB_STAGES


@dataclass(frozen=True)
class PipelinePaths:
    """The pipeline's persistent state, rooted under one directory."""

    root: str

    @property
    def dedup_index(self) -> str:
        return f"{self.root}/dedup_index"

    @property
    def bm25_index(self) -> str:
        return f"{self.root}/bm25_index"

    @property
    def survivors(self) -> str:
        return f"{self.root}/sem_survivors"

    @property
    def ivf_index(self) -> str:
        return f"{self.root}/ivf_index"

    @property
    def ivfpq_index(self) -> str:
        return f"{self.root}/ivfpq_index"

    @property
    def hll(self) -> str:
        return f"{self.root}/hll_daily"

    @property
    def countmin(self) -> str:
        return f"{self.root}/cm_source"

    @property
    def curated(self) -> str:
        return f"{self.root}/curated_parts"


def _exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path)
        return True
    except AnalysisException:
        return False


def _boundary(fail_after: str | None, stage: str) -> None:
    if fail_after == stage:
        raise RuntimeError(f"injected crash after stage {stage!r}")


def docs_leg(
    spark: SparkSession,
    docs: DataFrame,
    paths: PipelinePaths,
    batch_id: int,
    threshold: float = 0.5,
    fail_after: str | None = None,
) -> dict:
    """Stages 1-5 over one document batch: quality gate → dedup absorb →
    BM25 append → HLL upsert → count-min upsert.

    ``docs``: (doc_id, text, source, ts) — ts drives the HLL day bucket,
    source the count-min key. Returns per-stage stats."""
    from ..operators.bm25 import append_to_bm25_index, build_bm25_index
    from ..operators.dedup import absorb_batch_into_index, build_dedup_index
    from ..operators.quality import quality_filter
    from .heavy_stream import upsert_cm_sketch_batch
    from .hll_stream import upsert_hll_batch

    stats: dict = {"batch_id": batch_id}
    # ---- 1. quality gate (stateless) ------------------------------------
    gated = quality_filter(docs, "text", "doc_id").persist()
    try:
        stats["quality"] = {"n_in": docs.count(), "n_kept": gated.count()}
        _boundary(fail_after, "quality")

        # ---- 2. dedup absorb (bootstrap: EMPTY build, so batch 0 gets the
        # same in-batch domination semantics as every later batch) --------
        if not _exists(spark, f"{paths.dedup_index}/meta"):
            build_dedup_index(gated.limit(0), paths.dedup_index, "text", "doc_id")
        stats["dedup_absorb"] = absorb_batch_into_index(
            spark, paths.dedup_index, gated, "text", "doc_id", threshold
        )
        _boundary(fail_after, "dedup_absorb")

        # ---- 3. BM25 append of the docs the gate ACCEPTED ---------------
        # (registry semi-join: the index's doc_ids table is the accepted
        # set; BM25's own doclen registry makes the append replay-safe)
        accepted = gated.join(
            spark.read.parquet(f"{paths.dedup_index}/doc_ids").select(
                F.col("_cid").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )
        if not _exists(spark, f"{paths.bm25_index}/meta"):
            # bootstrap = build over batch 0's ACCEPTED set (equivalent to
            # appending into an empty index, which parquet cannot
            # represent schema-fully); a crash right after leaves a
            # retry whose append replays every id to zero
            stats["bm25_append"] = {
                "bootstrap_build": True,
                **build_bm25_index(accepted, paths.bm25_index, term_buckets=16),
            }
        else:
            stats["bm25_append"] = append_to_bm25_index(
                spark, paths.bm25_index, accepted
            )
        _boundary(fail_after, "bm25_append")

        # ---- 4./5. sketch maintenance over the RAW batch ----------------
        stats["hll"] = upsert_hll_batch(
            spark, docs, paths.hll, ts_col="ts", key_col="doc_id"
        )
        _boundary(fail_after, "hll")
        stats["countmin"] = upsert_cm_sketch_batch(
            spark, docs, paths.countmin, ["source"], batch_id
        )
        _boundary(fail_after, "countmin")

        # ---- 6. land the ACCEPTED docs in the curated parts table -------
        # (the warehouse tie-in: the corpus a BI/serving layer reads, with
        # a by-source projection answering mixture dashboards from states;
        # the table's own (app, batch) txn dedup makes this replay-safe)
        from ..sources.parts import create_parts_table, insert_into_parts

        create_parts_table(
            paths.curated,
            engine="append",
            projections={
                "by_source": {
                    "key_cols": ("source",),
                    "agg_spec": {"n": "sum", "chars": "sum"},
                }
            },
        )
        landed = accepted.select(
            "doc_id",
            "source",
            F.lit(1).cast("long").alias("n"),
            F.length("text").cast("long").alias("chars"),
        )
        ins = insert_into_parts(
            landed, paths.curated, batch_id=batch_id, app_id="pipeline-docs"
        )
        stats["parts_land"] = {"replayed": ins["replayed"], "version": ins["version"]}
        _boundary(fail_after, "parts_land")
    finally:
        gated.unpersist(blocking=True)
    return stats


def emb_leg(
    spark: SparkSession,
    embs: DataFrame,
    paths: PipelinePaths,
    batch_id: int,
    tau: float = 0.9,
    n_cells: int = 8,
    fail_after: str | None = None,
) -> dict:
    """Stages 6-8 over one embedding batch: semdedup → IVF append →
    IVF-PQ append. ``embs``: (vec_id, embedding).

    Per-index bootstrap flags: a crash between the two batch-0 builds
    must leave a retry that builds ONLY the missing index (deterministic
    same-data rebuilds are overwrite-safe; appends into a just-built
    index replay to zero)."""
    from ..operators.ivf import append_to_ivf_index, build_ivf_index, load_centroids
    from ..operators.pq import append_to_ivfpq_index, build_ivfpq_index
    from .semdedup_stream import upsert_semdedup_batch

    stats: dict = {"batch_id": batch_id}
    boot_pq = not _exists(spark, f"{paths.ivfpq_index}/centroids")
    if boot_pq:
        # batch 0 trains BOTH frozen quantizer tiers; the coarse centroids
        # are shared with semdedup (the ingest_gate shared-quantizer
        # discipline)
        build_ivfpq_index(
            embs, paths.ivfpq_index, n_cells=n_cells, cell_iters=3,
            m=8, ks=16, pq_iters=4,
        )
    boot_ivf = not _exists(spark, f"{paths.ivf_index}/centroids")
    if boot_ivf:
        build_ivf_index(embs, paths.ivf_index, n_cells=n_cells, iters=3)
    centroids = load_centroids(spark, paths.ivfpq_index)
    stats["semdedup"] = upsert_semdedup_batch(
        spark, embs, paths.survivors, centroids, tau=tau
    )
    _boundary(fail_after, "semdedup")
    if boot_ivf:
        stats["ivf_append"] = {"bootstrap_build": True, "n_batch": embs.count()}
    else:
        stats["ivf_append"] = append_to_ivf_index(spark, paths.ivf_index, embs)
    _boundary(fail_after, "ivf_append")
    if boot_pq:
        stats["ivfpq_append"] = {"bootstrap_build": True, "n_batch": embs.count()}
    else:
        stats["ivfpq_append"] = append_to_ivfpq_index(
            spark, paths.ivfpq_index, embs
        )
    _boundary(fail_after, "ivfpq_append")
    return stats


def ingest_pipeline_batch(
    spark: SparkSession,
    docs: DataFrame,
    embs: DataFrame,
    paths: PipelinePaths,
    batch_id: int,
    threshold: float = 0.5,
    tau: float = 0.9,
    n_cells: int = 8,
    fail_after: str | None = None,
) -> dict:
    """Run ONE micro-batch through all eight stages (module docstring).

    Returns the per-stage stats dict. Raises RuntimeError at the
    requested ``fail_after`` boundary (crash injection)."""
    stats = docs_leg(
        spark, docs, paths, batch_id, threshold=threshold, fail_after=fail_after
    )
    stats.update(
        emb_leg(
            spark, embs, paths, batch_id,
            tau=tau, n_cells=n_cells, fail_after=fail_after,
        )
    )
    return stats


def maintain_pipeline_streams(
    docs_stream: DataFrame,
    emb_stream: DataFrame,
    paths: PipelinePaths,
    checkpoint_root: str,
    threshold: float = 0.5,
    tau: float = 0.9,
    n_cells: int = 8,
    trigger: str = "5 seconds",
    on_batch: Callable[[dict], None] | None = None,
):
    """The streaming twin: the document leg and the embedding leg each
    run as their own ``foreachBatch`` stream (separate checkpoints under
    ``checkpoint_root``), so doc ingest never stalls behind embedding
    ingest and vice versa. Returns ``(docs_query, emb_query)``.

    The count-min batch-id watermark is fed from the docs stream's epoch
    id (monotonic under one checkpoint), preserving the exactly-once
    posture across restarts; every other stage is replay-convergent on
    its own. Single writer per index assumed — these two streams are the
    owners of everything under ``paths.root``."""

    def _docs(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.cachereg import release_tracked

        try:
            stats = docs_leg(
                batch_df.sparkSession, batch_df, paths, batch_id,
                threshold=threshold,
            )
            if on_batch is not None:
                on_batch({"leg": "docs", **stats})
        finally:
            release_tracked()

    def _embs(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.cachereg import release_tracked

        try:
            stats = emb_leg(
                batch_df.sparkSession, batch_df, paths, batch_id,
                tau=tau, n_cells=n_cells,
            )
            if on_batch is not None:
                on_batch({"leg": "embeddings", **stats})
        finally:
            release_tracked()

    dq = (
        docs_stream.writeStream.foreachBatch(_docs)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", f"{checkpoint_root}/docs")
        .start()
    )
    eq = (
        emb_stream.writeStream.foreachBatch(_embs)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", f"{checkpoint_root}/embeddings")
        .start()
    )
    return dq, eq
