"""Custom stateful streaming operators — ST5/ST6/ST7 (SURVEY.md §2.9).

The reference implements these as ad-hoc Python state in its producers:

- ST5: a TTL cache suppressing re-emission of an idEvent for 300 s
  (reference: producers/event_lookup_producer.py:25-51);
- ST6: a 5000-entry ring buffer of seen keys (producers/broadcast_producer.py:36-88);
- ST7: change-detection — league emitted only when strCurrentSeason changes,
  previous value kept in a JSON state file (producers/league_producer.py:132-175).

Spark-native equivalents:

- ``ttl_dedup`` — ``dropDuplicatesWithinWatermark`` (Spark >= 3.5): exact
  keyed dedup whose state is bounded by the watermark delay — both ST5 and
  ST6 are this operator with different delays/keys. State lives in the
  state store (RocksDB at scale), not a Python dict.
- ``ttl_dedup_custom`` — the same semantics via ``applyInPandasWithState``:
  the sanctioned extension point when the built-in doesn't fit (e.g.
  emit-first-then-suppress with per-key custom TTL). Arrow-batched,
  GroupState-backed, timeout-driven eviction.
- ``emit_changes`` — change-detection against the previous snapshot: a
  full-outer join on the key emitting insert/update rows only. Batch and
  foreachBatch share it (one transform, two drivers).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def ttl_dedup(stream: DataFrame, keys: Sequence[str], event_time: str, ttl: str) -> DataFrame:
    """ST5/ST6 as a built-in: keep the first record per key within the TTL
    window; state evicted once the watermark passes the TTL."""
    return stream.withWatermark(event_time, ttl).dropDuplicatesWithinWatermark(list(keys))


def make_ttl_dedup_fn(ttl_ms: int):
    """Build the applyInPandasWithState function for emit-first TTL dedup.

    Returns (func, output_schema, state_schema). Each group = one key; state
    = (emit epoch ms, suppressed count). TTL is measured from the last
    EMISSION — exactly the reference SeenCache (event_lookup_producer.py:
    mark() only on emit, should_skip measures from last emit). Suppressed
    arrivals therefore must NOT extend the deadline: the timeout is kept
    absolute by re-arming with the REMAINING time, and a key that keeps
    arriving is re-emitted once the TTL since its last emission elapses
    (either via the timer or inline when a batch lands past the deadline).
    The first output row per emission carries how many arrivals were
    swallowed since the previous emission.
    """
    output_schema = "key string, n_suppressed long"
    state_schema = "last_emit long, suppressed long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(p) for p in pdfs)
        if state.hasTimedOut:
            state.remove()  # TTL since last emit elapsed: key allowed again
            return
        now = state.getCurrentProcessingTimeMs()
        if state.exists:
            (last_emit, suppressed) = state.get
            remaining = ttl_ms - (now - last_emit)
            if remaining > 0:
                # inside the TTL window: swallow, keep the ABSOLUTE deadline
                state.update((last_emit, suppressed + n))
                state.setTimeoutDuration(int(remaining))
                return
            # deadline passed but the timer hadn't fired: fall through to emit
        state.update((now, 0))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "n_suppressed": [n - 1]})

    return fn, output_schema, state_schema


def ttl_dedup_custom(stream: DataFrame, key_col: str, ttl_ms: int = 300_000) -> DataFrame:
    """ST5 exactly as the reference's SeenCache behaves: emit the first
    sighting of a key, swallow repeats for ``ttl_ms``, then allow again.
    Custom logic -> applyInPandasWithState with processing-time timeout."""
    fn, output_schema, state_schema = make_ttl_dedup_fn(ttl_ms)
    return (
        stream.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def emit_changes(
    current: DataFrame,
    previous: DataFrame | None,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """ST7: emit only rows that are new or whose compared columns changed
    versus the previous snapshot. ``previous=None`` emits everything
    (first run). Output = current's columns + ``change_type``
    ('insert' | 'update').

    The join is on the natural key; at scale both sides are bucketed by the
    key so the comparison is co-partitioned.
    """
    if previous is None:
        return current.withColumn("change_type", F.lit("insert"))
    prev = previous.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__p_{c}") for c in compare_cols],
    )
    cond = [current[k] == prev[f"__k_{k}"] for k in keys]
    joined = current.join(prev, cond, "left")
    is_new = prev[f"__k_{keys[0]}"].isNull()
    changed = None
    for c in compare_cols:
        # null-safe inequality: <=> gives true on null==null
        ne = ~current[c].eqNullSafe(prev[f"__p_{c}"])
        changed = ne if changed is None else (changed | ne)
    return (
        joined.filter(is_new | changed)
        .withColumn("change_type", F.when(is_new, "insert").otherwise("update"))
        .select(*current.columns, "change_type")
    )
