"""Range-join operator: containment semantics (boundaries, multi-match,
long intervals spanning many bins), exactly-once pair production, naive
equivalence, and plan shape (equi-join only, no nested loop)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.range_join import (
    range_join,
)

_MIN_US = 60 * 1_000_000


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def _mk(spark, rows, cols):
    return spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])


def _pairs(points, intervals, **kw):
    out = range_join(points, intervals, on=["k"], point_col="ts",
                     start_col="s", end_col="e", **kw)
    return sorted((r.pid, r.i_iid) for r in out.collect())


def test_boundaries_inclusive_and_multimatch(spark):
    points = _mk(spark, [(1, "a", _ts(10)), (2, "a", _ts(0)), (3, "a", _ts(20)),
                         (4, "a", _ts(21)), (5, "b", _ts(10))],
                 ["pid", "k", "ts"])
    ivals = _mk(spark, [("a", 100, _ts(0), _ts(20)), ("a", 101, _ts(10), _ts(30))],
                ["k", "iid", "s", "e"])
    got = _pairs(points, ivals, bin_width_micros=30 * _MIN_US)
    assert got == [(1, 100), (1, 101), (2, 100), (3, 100), (3, 101), (4, 101)]


def test_interval_longer_than_bin_still_exact_once(spark):
    # 100-minute interval over 10-minute bins: replicated 11x, each
    # contained point must still appear exactly once.
    points = _mk(spark, [(i, "a", _ts(i * 7)) for i in range(20)], ["pid", "k", "ts"])
    ivals = _mk(spark, [("a", 1, _ts(5), _ts(105))], ["k", "iid", "s", "e"])
    got = _pairs(points, ivals, bin_width_micros=10 * _MIN_US)
    expect = sorted((i, 1) for i in range(20) if 5 <= i * 7 <= 105)
    assert got == expect


def test_matches_naive_reference(spark):
    import random
    rng = random.Random(7)
    points = _mk(spark, [(i, f"k{rng.randrange(3)}", _ts(rng.randrange(500)))
                         for i in range(80)], ["pid", "k", "ts"])
    iv_rows = []
    for i in range(30):
        s = rng.randrange(480)
        iv_rows.append((f"k{rng.randrange(3)}", i, _ts(s), _ts(s + rng.randrange(1, 40))))
    ivals = _mk(spark, iv_rows, ["k", "iid", "s", "e"])
    got = _pairs(points, ivals, bin_width_micros=40 * _MIN_US)
    expect = sorted(
        (p.pid, iv.iid)
        for p in points.collect()
        for iv in ivals.collect()
        if p.k == iv.k and iv.s <= p.ts <= iv.e
    )
    assert got == expect and len(expect) > 0


def test_plan_equi_join_no_nested_loop(spark):
    points = _mk(spark, [(1, "a", _ts(1))], ["pid", "k", "ts"])
    ivals = _mk(spark, [("a", 1, _ts(0), _ts(2))], ["k", "iid", "s", "e"])
    plan = (
        range_join(points, ivals, on=["k"], point_col="ts",
                   start_col="s", end_col="e", bin_width_micros=_MIN_US)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
