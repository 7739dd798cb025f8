"""ST7 on the Spark 4 transformWithStateInPandas API: cross-batch change
detection with typed ValueState."""

import json
import time

import pytest

# the TWS streaming runner imports google.protobuf at query start; without
# it the query crashes at runtime, so skip the whole module
pytest.importorskip("google.protobuf")

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.processors import (  # noqa: E402
    detect_changes_stream,
)


def _write_batch(src, name, rows):
    with open(f"{src}/{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _collect(spark, q, expected_n, timeout=60):
    q.processAllAvailable()
    deadline = time.time() + timeout
    while time.time() < deadline:
        rows = spark.sql("SELECT * FROM changes_sink").collect()
        if len(rows) >= expected_n:
            return rows
        time.sleep(0.5)
        q.processAllAvailable()
    return spark.sql("SELECT * FROM changes_sink").collect()


def test_change_detection_across_batches(spark, tmpdir):
    src = tmpdir.mkdir("src")
    ckpt = str(tmpdir.mkdir("ckpt"))
    _write_batch(
        src,
        "b0",
        [
            {"key": "league-1", "value": "2024", "ts": 1},
            {"key": "league-1", "value": "2024", "ts": 2},  # same value: no emit
            {"key": "league-2", "value": "2023", "ts": 1},
        ],
    )
    stream = spark.readStream.schema("key string, value string, ts long").json(str(src))
    out = detect_changes_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("changes_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        rows = _collect(spark, q, 2)
        got = {(r["key"], r["value"], r["change"]) for r in rows}
        assert got == {
            ("league-1", "2024", "insert"),
            ("league-2", "2023", "insert"),
        }

        # batch 2: one real change, one repeat (suppressed), one new key —
        # state must survive the micro-batch boundary
        _write_batch(
            src,
            "b1",
            [
                {"key": "league-1", "value": "2025", "ts": 3},
                {"key": "league-2", "value": "2023", "ts": 4},
                {"key": "league-3", "value": "1999", "ts": 1},
            ],
        )
        rows = _collect(spark, q, 4)
        got = {(r["key"], r["value"], r["change"]) for r in rows}
        assert ("league-1", "2025", "update") in got
        assert ("league-3", "1999", "insert") in got
        assert not any(r["key"] == "league-2" and r["change"] == "update" for r in rows)
    finally:
        q.stop()


def test_intra_batch_ordering_by_ts(spark, tmpdir):
    src = tmpdir.mkdir("src2")
    ckpt = str(tmpdir.mkdir("ckpt2"))
    # out-of-order arrival inside one batch: final state must follow ts order
    _write_batch(
        src,
        "b0",
        [
            {"key": "k", "value": "new", "ts": 9},
            {"key": "k", "value": "old", "ts": 1},
        ],
    )
    stream = spark.readStream.schema("key string, value string, ts long").json(str(src))
    out = detect_changes_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("changes_sink2")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(src, "b1", [{"key": "k", "value": "new", "ts": 10}])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM changes_sink2").collect()
        # 'old' then 'new' inside batch 0 (insert + update); the repeat of
        # 'new' in batch 1 is suppressed because state held the ts-latest
        changes = sorted((r["value"], r["change"]) for r in rows)
        assert changes == [("new", "update"), ("old", "insert")]
    finally:
        q.stop()
