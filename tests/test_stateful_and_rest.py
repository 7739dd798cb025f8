"""ST5/ST6/ST7 stateful operators + S7 REST source (SURVEY.md §2.9, §2.1)."""

import json
import os
import shutil
import tempfile

import pytest

from pyspark.sql import Row
from pyspark.sql import types as T

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.rest import (
    RateLimiter,
    fetch_json,
    rest_batch_to_df,
    unwrap_rows,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.stateful import (
    emit_changes,
    ttl_dedup,
    ttl_dedup_custom,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kickhouse-stateful-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------- ST5/ST6
def test_ttl_dedup_within_watermark(spark, tmpdir):
    src = f"{tmpdir}/src"
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    with open(f"{src}/a.json", "w") as f:
        for k, ts in [
            ("A", "2026-01-01T00:00:00Z"),
            ("A", "2026-01-01T00:01:00Z"),  # dup within TTL -> dropped
            ("B", "2026-01-01T00:00:30Z"),
        ]:
            f.write(json.dumps({"k": k, "ts": ts}) + "\n")
    stream = spark.readStream.schema(schema).json(src)
    out = ttl_dedup(stream, ["k"], "ts", "5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("ttl1")
        .option("checkpointLocation", f"{tmpdir}/chk")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM ttl1").collect()
    finally:
        q.stop()
    assert sorted(r["k"] for r in rows) == ["A", "B"]


def test_ttl_dedup_custom_emits_first_and_suppresses(spark, tmpdir):
    """applyInPandasWithState TTL cache: first sighting emitted, repeats
    swallowed while state is live (reference SeenCache, ST5)."""
    src = f"{tmpdir}/src"
    os.makedirs(src)
    schema = T.StructType([T.StructField("id", T.StringType())])
    with open(f"{src}/a.json", "w") as f:
        for i in ["E1", "E1", "E2", "E1", "E3", "E3"]:
            f.write(json.dumps({"id": i}) + "\n")
    stream = spark.readStream.schema(schema).json(src)
    out = ttl_dedup_custom(stream, "id", ttl_ms=300_000)
    # NOTE: a query with pending ProcessingTimeTimeout timers never reaches
    # the terminated/idle state (processAllAvailable and availableNow both
    # wait on the timers) — so poll the sink for the expected rows and stop.
    q = (
        out.writeStream.format("memory")
        .queryName("ttl2")
        .option("checkpointLocation", f"{tmpdir}/chk")
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    import time

    expected = {"E1": 2, "E2": 0, "E3": 1}
    rows = {}
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = {
                r["key"]: r["n_suppressed"] for r in spark.sql("SELECT * FROM ttl2").collect()
            }
            if rows == expected:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows == expected


def test_ttl_dedup_custom_reallows_after_ttl(spark, tmpdir):
    """TTL measured from the last EMISSION (reference SeenCache): a key seen
    again after the TTL elapses is re-emitted. Suppressed arrivals must not
    extend the deadline — the first file's repeat of E1 lands inside the
    window (swallowed), yet E1 still re-emits once the original TTL passes."""
    import time

    src = f"{tmpdir}/src"
    os.makedirs(src)
    schema = T.StructType([T.StructField("id", T.StringType())])
    with open(f"{src}/a.json", "w") as f:
        f.write(json.dumps({"id": "E1"}) + "\n")
        f.write(json.dumps({"id": "E1"}) + "\n")  # suppressed, inside TTL
    stream = spark.readStream.schema(schema).json(src)
    out = ttl_dedup_custom(stream, "id", ttl_ms=4_000)
    q = (
        out.writeStream.format("memory")
        .queryName("ttl3")
        .option("checkpointLocation", f"{tmpdir}/chk")
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        emitted_late = False
        wrote_b = False
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) AS n FROM ttl3").collect()[0]["n"]
            if n >= 1 and not wrote_b:
                # first emission landed; wait out the TTL, then resend E1
                time.sleep(5)
                with open(f"{src}/b.json", "w") as f:
                    f.write(json.dumps({"id": "E1"}) + "\n")
                wrote_b = True
            if n >= 2:
                emitted_late = True
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert emitted_late, "E1 was not re-emitted after the TTL elapsed"


# ------------------------------------------------------------------- ST7
def test_emit_changes_insert_update_skip(spark):
    prev = spark.createDataFrame(
        [Row(idLeague="L1", strCurrentSeason="2025"), Row(idLeague="L2", strCurrentSeason="2025")]
    )
    curr = spark.createDataFrame(
        [
            Row(idLeague="L1", strCurrentSeason="2026"),  # changed -> update
            Row(idLeague="L2", strCurrentSeason="2025"),  # unchanged -> skip
            Row(idLeague="L3", strCurrentSeason="2026"),  # new -> insert
        ]
    )
    out = emit_changes(curr, prev, ["idLeague"], ["strCurrentSeason"])
    got = {(r["idLeague"], r["change_type"]) for r in out.collect()}
    assert got == {("L1", "update"), ("L3", "insert")}
    # first run: everything is an insert
    first = emit_changes(curr, None, ["idLeague"], ["strCurrentSeason"])
    assert first.count() == 3


def test_emit_changes_null_safe(spark):
    schema = "k string, v string"
    prev = spark.createDataFrame([("a", None), ("b", "x")], schema)
    curr = spark.createDataFrame([("a", None), ("b", None)], schema)
    out = emit_changes(curr, prev, ["k"], ["v"])
    got = {(r["k"], r["change_type"]) for r in out.collect()}
    assert got == {("b", "update")}  # null==null is NOT a change


# -------------------------------------------------------------------- S7
def test_rate_limiter_paces_calls():
    t = {"now": 0.0}
    slept = []
    rl = RateLimiter(60, clock=lambda: t["now"], sleep=lambda s: slept.append(s))
    rl.wait()  # first call free
    rl.wait()  # 1 s interval -> sleeps
    assert slept and abs(slept[0] - 1.0) < 1e-9


def test_fetch_json_retry_and_404():
    calls = []

    def flaky(url):
        calls.append(url)
        return (429, "") if len(calls) < 3 else (200, '{"events": [{"idEvent": "1"}]}')

    out = fetch_json("http://x/api", transport=flaky, sleep=lambda s: None)
    assert out == {"events": [{"idEvent": "1"}]}
    assert len(calls) == 3
    assert fetch_json("http://x/gone", transport=lambda u: (404, ""), sleep=lambda s: None) is None


def test_unwrap_rows_shapes():
    assert unwrap_rows({"events": [{"a": 1}]}) == [{"a": 1}]
    assert unwrap_rows([{"a": 1}, 3]) == [{"a": 1}]
    assert unwrap_rows({"other": 1}) == []
    assert unwrap_rows(None) == []


def test_rest_batch_to_df_drops_unknown_keys(spark):
    schema = T.StructType(
        [T.StructField("idEvent", T.StringType()), T.StructField("strSport", T.StringType())]
    )

    def fake(url):
        return 200, json.dumps({"events": [{"idEvent": "7", "strSport": "Soccer", "zzz": "drop"}]})

    df = rest_batch_to_df(
        spark, ["http://x/1", "http://x/2"], schema, transport=fake,
        per_minute=10_000, sleep=lambda s: None,
    )
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["idEvent"] == "7" and rows[0]["strSport"] == "Soccer"
    assert df.columns == ["idEvent", "strSport"]
