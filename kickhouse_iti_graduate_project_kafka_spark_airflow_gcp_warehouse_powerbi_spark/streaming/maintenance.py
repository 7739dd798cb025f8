"""Incremental warehouse maintenance — the ClickHouse-MV replacement (ST8).

The reference's materialized views transform **each insert block** into the
dw star schema (ClickHouse DDL 229-439); joins in MVs fire only on inserts
to the *left* table (SURVEY.md §3.2 'hard parts'). The Spark-native
equivalent is ``foreachBatch``: every micro-batch runs the same DataFrame
transform the batch backfill uses — one transform function, two drivers —
and appends to a partitioned silver table.

Latest-state reads go through operators/latest.py views, never the raw
append table (mirrors README.md:475-477).

Sinks are partitioned parquet with **exactly-once effective semantics**
(Delta is not in this container): every micro-batch lands in its own
``_batch_id=<n>`` partition via dynamic-partition overwrite, so a
failed-then-retried batch REPLACES its partition instead of
double-appending — the same effective idempotence as the reference's
ClickPipes per-block inserts. Readers go through ``read_silver``, which
drops the bookkeeping column.

**Reader atomicity (commit manifest).** Dynamic overwrite alone is
idempotent but not atomic-with-readers: a reader concurrent with an
in-flight batch write could glimpse a partial ``_batch_id`` partition.
So each batch is COMMITTED only after its data write finishes: the
committed set lives in ONE swap-atomic manifest file
(``<table>/_commits/manifest.json``) updated by write-temp + fsync +
rename, and ``read_silver`` filters to committed batch ids (a
partition-pruning ``isin`` on the 8-byte batch column — the driver holds
one int per batch, nothing else). The ``_``-prefixed directory is
invisible to parquet discovery, like ``_spark_metadata``. Readers see
either the old committed set or the new one, never a torn state, and the
single file means one read (no listing) on every storage backend.

**Retry window: closed.** The historical gap — a crash between manifest
update and checkpoint commit causing the retried batch to REWRITE an
already-visible partition — is closed by making the manifest the single
source of truth of batch completion: ``write_batch_idempotent`` treats an
already-committed batch id as a finished write and SKIPS the data write
entirely (the partition's contents were final the instant its manifest
entry landed; the retry only needs the checkpoint to advance). This is
the same txn-id dedup Delta's idempotent writes use. No snapshot
isolation is required because committed partitions are never rewritten.

The manifest I/O is driver-local ``os`` file I/O, correct for
``file:``-scheme tables (this container). For object-store/HDFS paths it
FAILS CLOSED (raises) instead of silently dropping the visibility
guarantee — at cluster scale, route these helpers through the Hadoop
FileSystem API (same write-temp + rename protocol; see SCALING.md).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: bookkeeping partition column carrying foreachBatch's batchId
BATCH_COL = "_batch_id"

#: per-table directory of committed-batch markers
COMMITS_DIR = "_commits"


#: the single swap-atomic manifest file enumerating committed batch ids
MANIFEST = "manifest.json"


def _commits_path(target_path: str) -> str:
    return os.path.join(target_path, COMMITS_DIR)


def _require_local(target_path: str, op: str) -> str:
    """The manifest helpers use driver-local ``os`` I/O. A remote-scheme
    path (hdfs://, s3a://, gs://, ...) would silently bypass the
    whole-batch visibility guarantee, so fail CLOSED with a pointer at the
    cluster-scale fix instead of failing open. ``file:`` URIs are local —
    strip the scheme."""
    if target_path.startswith("file:"):
        return target_path[len("file:"):] or "/"
    if "://" in target_path:
        raise NotImplementedError(
            f"{op}: commit-manifest I/O for non-local path {target_path!r} "
            "must go through the Hadoop FileSystem API (write-temp + rename, "
            "same protocol); driver-local os I/O would fail open. See "
            "SCALING.md."
        )
    return target_path


def _read_manifest(d: str) -> set[int]:
    """Committed ids from the manifest file, merged with any legacy
    per-batch ``<id>.json`` markers (pre-manifest tables migrate on their
    next commit)."""
    ids: set[int] = set()
    mpath = os.path.join(d, MANIFEST)
    if os.path.isfile(mpath):
        try:
            with open(mpath) as f:
                ids.update(int(b) for b in json.load(f).get("batch_ids", []))
        except (json.JSONDecodeError, ValueError, OSError):
            # a torn manifest is impossible via os.replace; treat garbage
            # as corruption and fail loudly rather than un-commit batches
            raise RuntimeError(f"corrupt commit manifest: {mpath}")
    for name in os.listdir(d):
        if name.endswith(".json") and name != MANIFEST:
            try:
                ids.add(int(name[: -len(".json")]))
            except ValueError:
                continue
    return ids


def record_commit(target_path: str, batch_id: int) -> None:
    """Mark ``batch_id`` committed: rewrite the single manifest file with
    the full committed set via write-temp + fsync + atomic rename (the
    directory entry is fsynced too, so the rename survives power loss).
    Readers either see the old committed set or the new one — never a torn
    state. Single-writer per table (one streaming query owns a silver
    table), so the read-modify-write needs no lock."""
    target_path = _require_local(target_path, "record_commit")
    d = _commits_path(target_path)
    os.makedirs(d, exist_ok=True)
    ids = _read_manifest(d)
    ids.add(int(batch_id))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"version": 1, "batch_ids": sorted(ids)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, MANIFEST))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    dfd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def committed_batches(target_path: str) -> list[int] | None:
    """Committed batch ids, or None when the table has no manifest (a
    batch-backfilled table without ``_batch_id`` bookkeeping)."""
    target_path = _require_local(target_path, "committed_batches")
    d = _commits_path(target_path)
    if not os.path.isdir(d):
        return None
    return sorted(_read_manifest(d))


def write_batch_idempotent(
    out: DataFrame,
    batch_id: int,
    target_path: str,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Write one micro-batch's output under ``_batch_id=<batch_id>`` using
    dynamic-partition overwrite: only the partitions present in this batch
    are replaced, so re-running a batch id (Spark's at-least-once retry)
    yields byte-identical silver state instead of duplicates. Business
    partition columns nest UNDER the batch partition, so month-pruned reads
    still prune (parquet partition discovery handles both levels).

    An ALREADY-COMMITTED batch id is a completed write being retried
    (crash landed between manifest update and checkpoint commit): the
    data write is SKIPPED so the visible partition is never rewritten —
    this is what closes the marker-vs-checkpoint retry window."""
    committed = committed_batches(target_path)
    if committed is not None and int(batch_id) in committed:
        return
    (
        out.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL, *partition_cols)
        .parquet(target_path)
    )
    record_commit(target_path, batch_id)  # ONLY after the data write


def read_silver(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a silver table, hiding the ``_batch_id`` bookkeeping partition
    and — when a commit manifest exists — restricting to committed batches
    so concurrent in-flight writes are invisible (whole-batch reads)."""
    df = spark.read.parquet(target_path)
    commits = committed_batches(target_path)
    if commits is not None and BATCH_COL in df.columns:
        df = df.filter(F.col(BATCH_COL).isin(commits))
    return df.drop(BATCH_COL)


def foreach_batch_transform(
    stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_path: str,
    checkpoint: str,
    partition_cols: tuple[str, ...] = (),
    trigger: str = "5 seconds",
    static_joins: dict[str, DataFrame] | None = None,
) -> StreamingQuery:
    """Maintain a silver table: per micro-batch, apply ``transform`` (the
    same function the batch backfill calls) and write idempotently to
    ``target_path`` (see ``write_batch_idempotent``).

    ``static_joins`` documents the left-driven trigger semantics of the
    reference MVs (J1-J3): the joined parent is a *static snapshot* read
    per batch — inserts to the parent alone do not retrigger child rows,
    exactly like ClickHouse MV joins (DDL 369-414).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(transform(batch_df), batch_id, target_path, partition_cols)

    return (
        stream.writeStream.foreachBatch(_process)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def backfill(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_path: str,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """One-time seed of a silver table from existing bronze rows — the
    INSERT...SELECT backfill path (reference: DDL 474-613), sharing the
    exact transform function with the streaming maintenance."""
    # check BEFORE the data write: a remote path's stale manifest could not
    # be dropped below, which would fail open — raise up front instead of
    # leaving a half-done overwrite (matches record_commit's posture)
    local_path = _require_local(target_path, "backfill")
    writer = transform(source).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target_path)
    # a full overwrite invalidates any previous batch bookkeeping; drop a
    # stale manifest so read_silver doesn't filter the reseeded table away
    d = _commits_path(local_path)
    if os.path.isdir(d):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
