"""ST9: event-time tumbling-window aggregation with watermark + late-data
handling, driven as a real streaming query (the streaming twin of the
batch `events_hourly_counts` plan)."""

import json
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kickhouse-win-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_window_with_watermark_drops_too_late(spark, tmpdir):
    src = f"{tmpdir}/src"
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )

    def write(fname, rows):
        with open(f"{src}/{fname}", "w") as f:
            for ts, v in rows:
                f.write(json.dumps({"ts": ts, "v": v}) + "\n")

    # batch 1: two hours of data; advances the watermark to 12:00 - 10min
    write("a.json", [
        ("2026-01-01T10:05:00Z", 1),
        ("2026-01-01T10:45:00Z", 1),
        ("2026-01-01T11:30:00Z", 1),
        ("2026-01-01T12:00:00Z", 1),
    ])
    stream = spark.readStream.schema(schema).json(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win1")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/chk")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a record 2h older than the watermark -> silently dropped;
        # plus one that closes the 11:00 window
        write("b.json", [
            ("2026-01-01T09:10:00Z", 99),   # too late (watermark ~11:50)
            ("2026-01-01T13:00:00Z", 1),
        ])
        q.processAllAvailable()
        rows = {
            r["window_start"].isoformat(): r["n"]
            for r in spark.sql("SELECT * FROM win1").collect()
        }
    finally:
        q.stop()

    # append mode emits only finalized windows (watermark passed their end):
    # the 10:00 window (2 rows) and the 11:00 window (1 row) are closed;
    # the too-late 09:00 record never creates a window
    assert rows.get("2026-01-01T10:00:00") == 2
    assert rows.get("2026-01-01T11:00:00") == 1
    assert "2026-01-01T09:00:00" not in rows


def test_session_window_streaming_matches_batch_twin(spark, tmpdir):
    """ST10 driven for real: ``F.session_window`` under a streaming query
    (file JSON source standing in for MemoryStream, which pyspark does not
    expose) with a watermark, across three micro-batches. Proves

    - cross-batch session MERGE: one user's events arriving in different
      micro-batches within the gap collapse into one stateful session;
    - watermark-driven CLOSE: append mode emits a session only once the
      watermark passes its end (last event + gap);
    - equivalence with BOTH batch formulations on the same rows: the
      batch ``F.session_window`` groupBy, and the lag-based gap
      sessionization twin behind the ``user_sessions_30min`` catalog
      query (plans/dq_suite.py)."""
    src = f"{tmpdir}/src_sess"
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("user_id", T.StringType()), T.StructField("ts", T.TimestampType())]
    )

    def write(fname, rows):
        with open(f"{src}/{fname}", "w") as f:
            for uid, ts in rows:
                f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")

    all_rows = []

    def emit(fname, rows):
        all_rows.extend(rows)
        write(fname, rows)

    emit("a.json", [("A", "2026-01-01T10:00:00Z"), ("B", "2026-01-01T10:05:00Z")])
    stream = spark.readStream.schema(schema).json(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess1")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/chk_sess")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: A@10:10 is within the 30-min gap of A@10:00 held in
        # state from batch 1 -> MUST merge (extending the session end to
        # 10:40); A@11:30 opens a fresh session and pushes the watermark
        # to 11:20, closing A[10:00,10:40) and B[10:05,10:35)
        emit("b.json", [("A", "2026-01-01T10:10:00Z"), ("A", "2026-01-01T11:30:00Z")])
        q.processAllAvailable()
        # batch 3: watermark -> 12:50, closing A[11:30,12:00); the 13:00
        # session itself stays open forever (never emitted)
        emit("c.json", [("A", "2026-01-01T13:00:00Z")])
        q.processAllAvailable()
        emitted = {
            (r["user_id"], r["session_start"].isoformat(),
             r["session_end"].isoformat(), r["n_events"])
            for r in spark.sql("SELECT * FROM sess1").collect()
        }
    finally:
        q.stop()

    assert emitted == {
        ("A", "2026-01-01T10:00:00", "2026-01-01T10:40:00", 2),  # cross-batch merge
        ("B", "2026-01-01T10:05:00", "2026-01-01T10:35:00", 1),
        ("A", "2026-01-01T11:30:00", "2026-01-01T12:00:00", 1),
    }

    # batch twin 1: F.session_window over the same rows gives the same
    # sessions; streaming emitted exactly those whose end <= final
    # watermark (12:50)
    batch_df = spark.createDataFrame(
        [(u, t.replace("Z", "")) for u, t in all_rows], "user_id string, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    batch_sessions = {
        (r["user_id"], r["session_start"].isoformat(),
         r["session_end"].isoformat(), r["n_events"])
        for r in batch_df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .collect()
    }
    closed = {s for s in batch_sessions if s[2] <= "2026-01-01T12:50:00"}
    assert emitted == closed
    assert len(batch_sessions) == len(emitted) + 1  # the open 13:00 session

    # batch twin 2: the lag-based gap sessionization (the
    # user_sessions_30min plan shape) counts the same sessions per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    lag_ts = F.lag("ts").over(w)
    new_session = F.when(
        lag_ts.isNull() | (F.col("ts").cast("double") - lag_ts.cast("double") > 1800.0), 1
    ).otherwise(0)
    twin = {
        (r["user_id"], r["n_sessions"])
        for r in batch_df.withColumn("ns", new_session)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"))
        .collect()
    }
    session_window_counts = {
        (u, sum(1 for s in batch_sessions if s[0] == u)) for u in {"A", "B"}
    }
    assert twin == session_window_counts == {("A", 3), ("B", 1)}
