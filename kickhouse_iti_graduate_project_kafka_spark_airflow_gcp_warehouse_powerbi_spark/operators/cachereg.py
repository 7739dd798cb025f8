"""Session-scoped persist registry shared by operators.

Operators persist intermediates their returned LAZY DataFrame consumes
(shingle indexes, tagged as-of legs), so they cannot unpersist before the
caller's action runs. Every such persist registers here; a long-lived
session (the driver's 100+-query sweep, a BI server) calls
:func:`release_tracked` once consuming actions finish. Unpersist is
correctness-safe at any time — lineage recomputes — so an early release
costs at most a recompute.

DataFrame releases are BLOCKING: PySpark's default ``unpersist()`` only
enqueues eviction, so a caller that immediately starts the next
memory-hungry pass (a bench repeat, the next micro-batch, the next sweep
query) races its own stale blocks for heap — observed at sf10 as
monotonically growing repeat times under GC pressure. Waiting for the
eviction is the price of a cache clear that actually cleared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

_TRACKED_BROADCASTS: list = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for bulk release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def track_broadcast(bc):
    """Register a SparkContext broadcast for bulk release. Release uses
    ``unpersist`` (not ``destroy``): executors drop their copy and free
    memory, while a later re-execution of a plan closing over the
    broadcast transparently re-fetches from the driver — so releasing is
    always safe, like unpersisting a DataFrame."""
    _TRACKED_BROADCASTS.append(bc)
    return bc


def release_tracked() -> int:
    """Unpersist every tracked DataFrame and broadcast; returns how many
    were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=True)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    while _TRACKED_BROADCASTS:
        bc = _TRACKED_BROADCASTS.pop()
        try:
            bc.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n
