"""SCD Type-2 collapse (operators/scd.py) edge-case semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.asof import (
    asof_join,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.scd import (
    scd2_collapse,
)


def _ts(minute):
    return datetime(2024, 1, 1, 0, minute)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "key string, seq long, ts timestamp, attr string")


def _collapse(df):
    return scd2_collapse(df, keys=["key"], attr_col="attr", ts_col="ts", tiebreak=["seq"])


def test_single_event_is_one_open_version(spark):
    out = _collapse(_frame(spark, [("a", 1, _ts(0), "x")])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.version, r.attr, r.valid_to, r.n_events, r.is_current) == (
        1,
        "x",
        None,
        1,
        1,
    )
    assert r.valid_from == _ts(0)


def test_constant_attribute_collapses_to_one_run(spark):
    rows = [("a", i, _ts(i), "x") for i in range(5)]
    out = _collapse(_frame(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].n_events == 5
    assert out[0].valid_from == _ts(0)
    assert out[0].is_current == 1


def test_alternating_attribute_versions_and_intervals_tile(spark):
    rows = [("a", i, _ts(i), "xy"[i % 2]) for i in range(4)]
    out = sorted(_collapse(_frame(spark, rows)).collect(), key=lambda r: r.version)
    assert [r.attr for r in out] == ["x", "y", "x", "y"]
    assert [r.version for r in out] == [1, 2, 3, 4]
    # [valid_from, valid_to) intervals tile the timeline exactly
    for a, b in zip(out, out[1:]):
        assert a.valid_to == b.valid_from
    assert out[-1].valid_to is None
    assert [r.is_current for r in out] == [0, 0, 0, 1]


def test_null_attr_is_distinct_from_semantics(spark):
    rows = [
        ("a", 0, _ts(0), "x"),
        ("a", 1, _ts(1), None),
        ("a", 2, _ts(2), None),
        ("a", 3, _ts(3), "x"),
    ]
    out = sorted(_collapse(_frame(spark, rows)).collect(), key=lambda r: r.version)
    assert [r.attr for r in out] == ["x", None, "x"]
    assert [r.n_events for r in out] == [1, 2, 1]


def test_tiebreak_orders_equal_timestamps(spark):
    # same ts: seq decides, so runs are x(2) then y(1), never 3 runs
    rows = [("a", 2, _ts(0), "y"), ("a", 0, _ts(0), "x"), ("a", 1, _ts(0), "x")]
    out = sorted(_collapse(_frame(spark, rows)).collect(), key=lambda r: r.version)
    assert [(r.attr, r.n_events) for r in out] == [("x", 2), ("y", 1)]


def test_keys_are_independent(spark):
    rows = [("a", 0, _ts(0), "x"), ("b", 0, _ts(1), "x"), ("b", 1, _ts(2), "y")]
    out = _collapse(_frame(spark, rows))
    counts = {r.key: r.n for r in out.groupBy("key").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 1, "b": 2}


def test_point_in_time_lookup_roundtrip(spark):
    """as-of lookup against the SCD2 dim returns each event's own attr."""
    rows = [("a", i, _ts(3 * i), "xyz"[i % 3]) for i in range(6)]
    events = _frame(spark, rows)
    dim = _collapse(events)
    probe = events.select("key", F.col("ts").alias("probe_ts"), "attr")
    looked = asof_join(
        probe,
        dim.select("key", F.col("attr").alias("dim_attr"), "valid_from"),
        on=["key"],
        left_ts="probe_ts",
        right_ts="valid_from",
    )
    bad = looked.filter(~F.col("r_dim_attr").eqNullSafe(F.col("attr"))).count()
    assert bad == 0
