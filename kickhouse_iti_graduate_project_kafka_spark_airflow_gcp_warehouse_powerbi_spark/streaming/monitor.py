"""Streaming progress monitoring (ST11) — a StreamingQueryListener in place
of the reference's 10-second status-polling thread
(reference: spark/jobs/validate_json.py:686-700)."""

from __future__ import annotations

import json
import logging

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("kickhouse.streaming")


class ProgressLogger(StreamingQueryListener):
    """Logs batch progress (rows/sec, batch duration) per query; keeps the
    last progress dict for programmatic health checks."""

    def __init__(self) -> None:
        self.last_progress: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:
        log.info("query started: %s (%s)", event.name, event.id)

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        self.last_progress[p.get("name") or p["id"]] = p
        log.info(
            "query %s batch %s: %s rows, %.0f rows/s",
            p.get("name") or p["id"],
            p.get("batchId"),
            p.get("numInputRows"),
            p.get("processedRowsPerSecond") or 0.0,
        )

    def onQueryTerminated(self, event) -> None:
        log.info("query terminated: %s (exception=%s)", event.id, event.exception)

    def onQueryIdle(self, event) -> None:  # Spark >= 3.5
        pass


def attach(spark) -> ProgressLogger:
    listener = ProgressLogger()
    spark.streams.addListener(listener)
    return listener
