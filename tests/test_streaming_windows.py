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
