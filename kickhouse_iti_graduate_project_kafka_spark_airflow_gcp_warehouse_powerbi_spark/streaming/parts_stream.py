"""Streaming ingestion into a parts table — the ClickPipes/Kafka-engine
analogue of the reference's continuous warehouse inserts.

ClickHouse ingests a Kafka stream as a sequence of insert blocks, each
becoming a MergeTree part, deduplicated by block hash on retry
(reference README.md:96-133: ClickPipes → MergeTree). The Spark twin is
``foreachBatch`` over :func:`..sources.parts.insert_into_parts`:

- each micro-batch lands as ONE part (insert blocks = parts, preserved);
- exactly-once EFFECTIVE semantics come from the parts table's own
  ``(app_id, batch_id)`` transaction dedup — a batch retried after a
  crash between the part write and the checkpoint commit re-runs
  ``insert_into_parts``, which sees its id committed and no-ops (the
  orphan part from a crash *before* the version commit is invisible and
  vacuumed later);
- ``app_id`` defaults to the checkpoint's persisted streaming query id
  (the same stream-identity rule maintenance.py enforces): a RESET
  checkpoint restarts batch ids at 0 under a fresh query id, which is a
  new transaction namespace — re-ingestion, never silent data loss.

With a ``replacing`` engine this is a streaming upsert pipeline: CDC
events inserted as-they-arrive; readers call ``read_parts(final=True)``
for latest-state, and a periodic ``optimize_parts`` + ``vacuum_parts``
maintenance pass (the background-merge analogue) keeps the part count
and FINAL cost bounded. Scale: each micro-batch costs exactly its own
write + one tiny version-file commit; nothing rewrites history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.parts import aggregate_states, insert_into_parts
from .maintenance import _checkpoint_query_id


def parts_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    trigger: str = "5 seconds",
    app_id: str | None = None,
) -> StreamingQuery:
    """Continuously append a stream to the parts table at ``path``.

    The table must already exist (``create_parts_table``) — schema and
    engine are table properties, not stream properties."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        app = app_id if app_id is not None else _checkpoint_query_id(checkpoint)
        insert_into_parts(batch_df, path, batch_id=int(batch_id), app_id=app or "")

    return (
        stream.writeStream.foreachBatch(_process)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def aggregating_parts_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: Sequence[str],
    agg_spec: dict[str, str],
    trigger: str = "5 seconds",
    app_id: str | None = None,
) -> StreamingQuery:
    """Streaming materialized view onto an ``aggregating`` parts table —
    the reference's ClickHouse `MV -> AggregatingMergeTree` pattern
    (insert block in, aggregate STATES out), Spark-first.

    Each micro-batch is pre-aggregated to partial-state rows
    (:func:`..sources.parts.aggregate_states`) and lands as ONE part;
    ``read_parts(final=True)`` merges states at O(|keys| x |parts|)
    whatever the raw-row history, and periodic ``optimize_parts`` keeps
    |parts| bounded. Exactly-once EFFECTIVE: the table's (app_id,
    batch_id) transaction dedup makes a crash-retried batch a no-op, and
    because each batch's contribution is one immutable part, a replay can
    never double-count a state (the additive hazard count-min has —
    heavy_stream.py — does not exist here). The stream must already be
    projected to the state-column shape (e.g. ``n=1, total=v, hi=v``)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        app = app_id if app_id is not None else _checkpoint_query_id(checkpoint)
        states = aggregate_states(batch_df, key_cols, agg_spec)
        insert_into_parts(states, path, batch_id=int(batch_id), app_id=app or "")

    return (
        stream.writeStream.foreachBatch(_process)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint)
        .start()
    )
