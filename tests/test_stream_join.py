"""Watermarked stream-stream interval join: matches inside the band,
nothing outside it, batch-equivalent results."""

import json

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.joins import (
    interval_join,
)

SCHEMA_L = "key string, l_ts timestamp, score long"
SCHEMA_R = "key string, r_ts timestamp, name string"


def _write(src, name, rows):
    with open(f"{src}/{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_interval_join_band_semantics(spark, tmpdir):
    lsrc, rsrc = tmpdir.mkdir("l"), tmpdir.mkdir("r")
    ckpt = str(tmpdir.mkdir("ck"))
    _write(
        lsrc,
        "b0",
        [
            {"key": "e1", "l_ts": "2026-01-01 10:00:00", "score": 1},
            {"key": "e2", "l_ts": "2026-01-01 10:00:00", "score": 2},
            {"key": "e3", "l_ts": "2026-01-01 10:00:00", "score": 3},
        ],
    )
    _write(
        rsrc,
        "b0",
        [
            # in band: 5 min after the event
            {"key": "e1", "r_ts": "2026-01-01 10:05:00", "name": "hit"},
            # out of band: 25 min after (upper is 10 min)
            {"key": "e2", "r_ts": "2026-01-01 10:25:00", "name": "late"},
            # wrong key
            {"key": "zz", "r_ts": "2026-01-01 10:05:00", "name": "orphan"},
        ],
    )
    left = spark.readStream.schema(SCHEMA_L).json(str(lsrc))
    right = spark.readStream.schema(SCHEMA_R).json(str(rsrc))
    joined = interval_join(
        left, right, ["key"], "l_ts", "r_ts", upper="10 minutes", lower="0 seconds"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT key, score, name FROM sj_sink").collect()
        assert {(r["key"], r["score"], r["name"]) for r in rows} == {("e1", 1, "hit")}
    finally:
        q.stop()


def test_interval_join_matches_batch_twin(spark, tmpdir):
    # the same interval join expressed in batch must agree row-for-row
    lsrc, rsrc = tmpdir.mkdir("l2"), tmpdir.mkdir("r2")
    ckpt = str(tmpdir.mkdir("ck2"))
    lrows = [
        {"key": f"k{i % 4}", "l_ts": f"2026-01-01 10:{i:02d}:00", "score": i}
        for i in range(20)
    ]
    rrows = [
        {"key": f"k{i % 4}", "r_ts": f"2026-01-01 10:{(i + 3):02d}:00", "name": f"n{i}"}
        for i in range(20)
    ]
    _write(lsrc, "b0", lrows)
    _write(rsrc, "b0", rrows)
    left = spark.readStream.schema(SCHEMA_L).json(str(lsrc))
    right = spark.readStream.schema(SCHEMA_R).json(str(rsrc))
    q = (
        interval_join(left, right, ["key"], "l_ts", "r_ts", upper="5 minutes")
        .writeStream.format("memory")
        .queryName("sj_sink2")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["key"], r["score"], r["name"])
            for r in spark.sql("SELECT key, score, name FROM sj_sink2").collect()
        }
    finally:
        q.stop()
    from datetime import datetime

    def _dt(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")

    lb = spark.createDataFrame(
        [(r["key"], _dt(r["l_ts"]), r["score"]) for r in lrows], SCHEMA_L
    )
    rb = spark.createDataFrame(
        [(r["key"], _dt(r["r_ts"]), r["name"]) for r in rrows], SCHEMA_R
    )
    exp = {
        (r["key"], r["score"], r["name"])
        for r in interval_join(lb, rb, ["key"], "l_ts", "r_ts", upper="5 minutes").collect()
    }
    assert got == exp and len(exp) > 0
