"""Incremental warehouse maintenance — the ClickHouse-MV replacement (ST8).

The reference's materialized views transform **each insert block** into the
dw star schema (ClickHouse DDL 229-439); joins in MVs fire only on inserts
to the *left* table (SURVEY.md §3.2 'hard parts'). The Spark-native
equivalent is ``foreachBatch``: every micro-batch runs the same DataFrame
transform the batch backfill uses — one transform function, two drivers —
and appends to a partitioned silver table.

Latest-state reads go through operators/latest.py views, never the raw
append table (mirrors README.md:475-477).

Sinks are plain partitioned parquet (Delta is not in this container; the
append-only + view-dedup design needs no table format transactions —
foreachBatch's batchId gives at-least-once with idempotent re-runs via
overwrite-by-batch subdirectories if needed).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


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
    same function the batch backfill calls) and append to ``target_path``.

    ``static_joins`` documents the left-driven trigger semantics of the
    reference MVs (J1-J3): the joined parent is a *static snapshot* read
    per batch — inserts to the parent alone do not retrigger child rows,
    exactly like ClickHouse MV joins (DDL 369-414).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        writer = out.write.mode("append")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(target_path)

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
