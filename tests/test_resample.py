"""Resample operator: the native (grid-explode + as-of sweep) primary and
its grouped-map (`applyInPandas`) twin must agree exactly; grid boundary
semantics and the no-boundary-crossing edge."""

import datetime as dt

from pyspark.sql import Row

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.resample import (
    HOUR_US,
    hourly_ffill_resample,
    hourly_ffill_resample_arrow,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


def test_grouped_map_equals_native_composition(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    got = sorted(
        (r.user_id, r.hour_idx, r.value)
        for r in hourly_ffill_resample_arrow(ev).collect()
    )
    expect = sorted(
        (r.user_id, r.hour_idx, r.value)
        for r in hourly_ffill_resample(ev).collect()
    )
    assert len(got) > 100
    assert got == expect


def test_grid_bounds_and_ffill(spark):
    h = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return h + dt.timedelta(minutes=minutes)

    ev = spark.createDataFrame(
        [
            # user 1: obs at 00:30 (v=1), 02:10 (v=2) -> grid hours 1,2
            Row(user_id=1, ts=at(30), value=1.0),
            Row(user_id=1, ts=at(130), value=2.0),
            # user 2: both obs inside hour 0 -> no boundary crossed, no rows
            Row(user_id=2, ts=at(10), value=9.0),
            Row(user_id=2, ts=at(50), value=8.0),
            # user 3: obs exactly ON the hour boundary -> included at that hour
            Row(user_id=3, ts=at(60), value=5.0),
            Row(user_id=3, ts=at(125), value=6.0),
        ]
    )
    rows = {
        (r.user_id, r.hour_idx): r.value
        for r in hourly_ffill_resample(ev).collect()
    }
    base_h = int(h.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) // HOUR_US
    assert rows[(1, base_h + 1)] == 1.0  # hour 1: carries 00:30 obs
    assert rows[(1, base_h + 2)] == 1.0  # 02:00 grid point: 02:10 obs is later
    assert not any(u == 2 for (u, _) in rows)
    assert rows[(3, base_h + 1)] == 5.0  # boundary obs included at its own hour


def test_grid_value_at_exact_grid_point(spark):
    # disambiguate the comment above: at hour-2 grid point (02:00) the
    # latest obs at-or-before is still the 00:30 one.
    h = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(user_id=1, ts=h + dt.timedelta(minutes=30), value=1.0),
            Row(user_id=1, ts=h + dt.timedelta(minutes=130), value=2.0),
        ]
    )
    rows = {
        r.hour_idx: r.value for r in hourly_ffill_resample(ev).collect()
    }
    base_h = int(h.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) // HOUR_US
    assert rows == {base_h + 1: 1.0, base_h + 2: 1.0}


def test_pre_epoch_timestamps_floor_semantics(spark):
    """ADVICE r4: `div` truncates toward zero, so pre-1970 (negative
    epoch-micros) timestamps need explicit floor/ceil division. The native
    plan must match the numpy-floor Arrow twin on both sides of the
    epoch."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.resample import (
        hourly_ffill_resample,
        hourly_ffill_resample_arrow,
    )

    rows = [
        # user 1: straddles the epoch (1969-12-31 21:30 .. 1970-01-01 02:10)
        (1, "1969-12-31 21:30:00", 10.0),
        (1, "1969-12-31 23:45:00", 20.0),
        (1, "1970-01-01 02:10:00", 30.0),
        # user 2: entirely pre-1970
        (2, "1969-12-30 05:20:00", 1.0),
        (2, "1969-12-30 09:10:00", 2.0),
    ]
    from pyspark.sql import functions as SF

    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", SF.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    native = sorted(tuple(r) for r in hourly_ffill_resample(df).collect())
    arrow = sorted(tuple(r) for r in hourly_ffill_resample_arrow(df).collect())
    assert native == arrow
    got = {(r[0], r[1]): r[2] for r in native}
    # user 1: first obs 21:30 -> grid starts at hour ceil = 22:00 (hour_idx -2)
    # and ends at floor(02:10) = 02:00 (hour_idx 2)
    assert got[(1, -2)] == 10.0 and got[(1, -1)] == 10.0
    # grid point 02:00 precedes the 02:10 observation, so it still carries
    # the 23:45 value; the grid ends at floor(last obs) = hour 2
    assert got[(1, 0)] == 20.0 and got[(1, 1)] == 20.0 and got[(1, 2)] == 20.0
    assert (1, -3) not in got and (1, 3) not in got
