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
So each batch is COMMITTED only after its data write finishes: a marker
file lands in ``<table>/_commits/<batch_id>.json`` via write-temp +
atomic rename, and ``read_silver`` filters to committed batch ids (a
partition-pruning ``isin`` on the 8-byte batch column — the driver holds
one int per batch, nothing else). The ``_``-prefixed directory is
invisible to parquet discovery, like ``_spark_metadata``. Remaining
window, stated honestly: a retry of a batch whose data AND marker both
landed (crash between marker and checkpoint commit) briefly rewrites an
already-visible partition — closing that needs snapshot isolation
(Delta/Iceberg); on a cluster the same protocol runs through the Hadoop
FileSystem rename.
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


def _commits_path(target_path: str) -> str:
    return os.path.join(target_path, COMMITS_DIR)


def record_commit(target_path: str, batch_id: int) -> None:
    """Mark ``batch_id`` committed: write the marker to a temp file and
    atomically rename it into ``_commits/``. Readers either see the marker
    (whole batch visible) or don't (batch invisible) — never a torn state."""
    d = _commits_path(target_path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"batch_id": int(batch_id)}, f)
    os.replace(tmp, os.path.join(d, f"{int(batch_id)}.json"))


def committed_batches(target_path: str) -> list[int] | None:
    """Committed batch ids, or None when the table has no manifest (a
    batch-backfilled table without ``_batch_id`` bookkeeping)."""
    d = _commits_path(target_path)
    if not os.path.isdir(d):
        return None
    out = []
    for name in os.listdir(d):
        if name.endswith(".json"):
            try:
                out.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


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
    still prune (parquet partition discovery handles both levels)."""
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
    writer = transform(source).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target_path)
    # a full overwrite invalidates any previous batch bookkeeping; drop a
    # stale manifest so read_silver doesn't filter the reseeded table away
    d = _commits_path(target_path)
    if os.path.isdir(d):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
