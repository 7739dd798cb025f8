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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: bookkeeping partition column carrying foreachBatch's batchId
BATCH_COL = "_batch_id"


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


def read_silver(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a silver table, hiding the ``_batch_id`` bookkeeping partition."""
    return spark.read.parquet(target_path).drop(BATCH_COL)


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
