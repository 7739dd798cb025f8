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

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.parts import insert_into_parts
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
