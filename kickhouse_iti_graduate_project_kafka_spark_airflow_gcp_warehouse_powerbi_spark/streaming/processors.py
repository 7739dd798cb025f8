"""transformWithStateInPandas processors — Spark 4's typed-state API.

ST7 (change detection) re-expressed on the *new* arbitrary-state API
(SPARK-49816, Spark 4.x): explicit named state variables with schemas and
per-state TTL, instead of applyInPandasWithState's single opaque tuple.
The reference keeps "last seen season per league" in a JSON file next to
the producer (league_producer.py:132-175); here it is a ``ValueState``
in the state store — RocksDB-backed, checkpointed, and rescalable at
cluster scale.

Why both implementations exist in this repo: ``stateful.emit_changes``
covers the batch/foreachBatch path; this processor covers the continuous
streaming path where the previous value must outlive any single
micro-batch without a snapshot table join.

Environment note: transformWithStateInPandas runs a separate streaming
Python runner that imports ``google.protobuf``; this container has no
protobuf, so the tests skip here (``applyInPandasWithState`` in
``stateful.py`` carries the executable coverage for custom state). On any
standard cluster image (protobuf ships with pyspark[connect]) this module
runs as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StructType

#: output schema: the key, the new value, and what happened
CHANGE_SCHEMA = "key string, value string, change string"


class ChangeDetectProcessor(StatefulProcessor):
    """Per-key change detector: emits a row only when the tracked value
    differs from the last emitted one (first sighting emits 'insert',
    a different value emits 'update', identical values emit nothing).

    State per key: one string — bounded by key cardinality, not stream
    length. With many short-lived keys, pass ``ttl_ms`` so abandoned keys
    age out of the store instead of accumulating forever.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState("last_value", "value string", self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        # batches arrive in arbitrary intra-batch order; sort by the ts
        # column so "latest value" is well-defined within the micro-batch
        df = pd.concat(list(rows), ignore_index=True)
        if df.empty:
            return
        df = df.sort_values("ts", kind="stable")
        prev = self._last.get()[0] if self._last.exists() else None
        out = []
        for value in df["value"]:
            if prev is None:
                out.append((key[0], value, "insert"))
            elif value != prev:
                out.append((key[0], value, "update"))
            prev = value
        self._last.update((prev,))
        if out:
            yield pd.DataFrame(out, columns=["key", "value", "change"])

    def close(self) -> None:
        pass


def detect_changes_stream(
    stream: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    ts_col: str = "ts",
    ttl_ms: int | None = None,
    output_schema: StructType | str = CHANGE_SCHEMA,
) -> DataFrame:
    """ST7 on transformWithStateInPandas: per-key value-change stream.

    Input needs (key, value, ts) columns (rename upstream); output is one
    row per observed change. Update mode; processing-time timers only when
    TTL is set.
    """
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("ts"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        statefulProcessor=ChangeDetectProcessor(ttl_ms),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms else "None",
    )
