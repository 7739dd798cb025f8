"""windowFunnel strict modes (operators/funnel.py).

Pins the ClickHouse getEventLevel semantics with hand-computed streams,
proves the default-mode fold equals the join/scan funnel on the tie-free
fixture, and cross-checks the Spark fold against the generated DuckDB
recursive-CTE oracle on seeded random event streams (the two independent
implementations of the same automaton must agree everywhere).
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.funnel import (
    window_funnel_levels,
    window_funnel_oracle_sql,
)

STEPS = ("A", "B", "C")
SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _ev(spark, rows):
    """rows: (user, epoch_sec, type, id) -> events-shaped DataFrame."""
    data = [
        (u, datetime.datetime.fromtimestamp(t, datetime.timezone.utc).replace(tzinfo=None), et, i)
        for (u, t, et, i) in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def _level(spark, rows, window=100, **mode):
    df = window_funnel_levels(_ev(spark, rows), STEPS, window, **mode)
    out = {r.user_id: r.funnel_level for r in df.collect()}
    return out


def test_default_chain_and_window(spark):
    rows = [(1, 0, "A", 1), (1, 50, "B", 2), (1, 150, "C", 3)]
    assert _level(spark, rows) == {1: 2}  # C misses the 100s window
    rows = [(1, 0, "A", 1), (1, 50, "B", 2), (1, 99, "C", 3)]
    assert _level(spark, rows) == {1: 3}


def test_default_keeps_latest_chain_start(spark):
    # restart at A(60) re-opens the window budget: C(150) <= 60+100
    rows = [
        (1, 0, "A", 1), (1, 50, "B", 2),
        (1, 60, "A", 3), (1, 70, "B", 4), (1, 150, "C", 5),
    ]
    assert _level(spark, rows) == {1: 3}


def test_strict_order_breaks_on_other(spark):
    rows = [(1, 1, "A", 1), (1, 2, "B", 2), (1, 3, "X", 3), (1, 4, "C", 4)]
    assert _level(spark, rows) == {1: 3}
    assert _level(spark, rows, strict_order=True) == {1: 2}
    # noise BEFORE the chain starts does not break
    rows = [(1, 0, "X", 1), (1, 1, "A", 2), (1, 2, "B", 3), (1, 3, "C", 4)]
    assert _level(spark, rows, strict_order=True) == {1: 3}


def test_strict_dedup_interrupts_on_repeat(spark):
    rows = [(1, 1, "A", 1), (1, 2, "B", 2), (1, 3, "B", 3), (1, 4, "C", 4)]
    assert _level(spark, rows) == {1: 3}
    assert _level(spark, rows, strict_dedup=True) == {1: 2}
    # cond-1 repeats are exempt (they restart the candidate chain)
    rows = [(1, 1, "A", 1), (1, 2, "A", 2), (1, 3, "B", 3), (1, 4, "C", 4)]
    assert _level(spark, rows, strict_dedup=True) == {1: 3}


def test_strict_increase_rejects_equal_ts(spark):
    rows = [(1, 1, "A", 1), (1, 1, "B", 2), (1, 2, "C", 3)]
    assert _level(spark, rows) == {1: 3}
    assert _level(spark, rows, strict_increase=True) == {1: 1}


def test_level_zero_without_cond1(spark):
    rows = [(1, 1, "B", 1), (1, 2, "C", 2)]
    assert _level(spark, rows) == {1: 0}


def test_default_mode_equals_join_scan_funnel(spark, sf_small):
    """On the tie-free fixture the automaton's default mode must equal
    events_window_funnel's declarative join plan level-for-level."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans.dq_suite import (
        events_window_funnel,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, sf_small, "events")
    fold = window_funnel_levels(ev, ("view", "signup", "purchase"), 21600)
    join = events_window_funnel(spark, sf_small)
    f = {r.user_id: r.funnel_level for r in fold.collect()}
    j = {r.user_id: r.funnel_level for r in join.collect()}
    # join plan keys on users WITH a view (level>=1); fold also carries
    # level-0 users (signup/purchase but no view)
    assert j == {u: l for u, l in f.items() if l >= 1}
    assert all(l >= 1 for l in j.values())


@pytest.mark.parametrize(
    "mode",
    [
        {},
        {"strict_order": True},
        {"strict_dedup": True},
        {"strict_increase": True},
        {"strict_order": True, "strict_dedup": True, "strict_increase": True},
    ],
)
def test_fold_matches_duckdb_cte_on_random_streams(spark, mode):
    """Two independent implementations of the automaton (Spark fold vs
    generated recursive CTE) agree on seeded random streams with ties,
    noise, repeats, and restarts."""
    rng = random.Random(411)
    rows = []
    eid = 0
    for u in range(20):
        for _ in range(rng.randint(0, 40)):
            eid += 1
            # coarse clock => plenty of equal-timestamp collisions
            rows.append(
                (u, rng.randint(0, 300), rng.choice(["A", "B", "C", "X", "Y"]), eid)
            )
    ev = _ev(spark, rows)
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel_levels(ev, STEPS, 120, **mode).collect()
    }
    pdf = pd.DataFrame(
        [(u, pd.Timestamp(t, unit="s"), et, i) for (u, t, et, i) in rows],
        columns=["user_id", "ts", "event_type", "event_id"],
    )
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        sql = window_funnel_oracle_sql(STEPS, 120, **mode)
        dist = dict(con.execute(sql).fetchall())
    finally:
        con.close()
    want = {}
    for lvl in got.values():
        want[lvl] = want.get(lvl, 0) + 1
    assert want == dist


def test_rejects_degenerate_steps(spark):
    ev = _ev(spark, [(1, 1, "A", 1)])
    with pytest.raises(ValueError):
        window_funnel_levels(ev, ("A",), 10)
    with pytest.raises(ValueError):
        window_funnel_levels(ev, ("A", "A"), 10)


def test_arena_guard_fires_loudly(spark):
    import py4j.protocol
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [(1, t, "A", t + 1) for t in range(50)]
    ev = _ev(spark, rows)
    # under the bound: fine
    out = window_funnel_levels(ev, ("A", "B"), 10, max_events_per_key=50)
    assert out.count() == 1
    with pytest.raises((SparkRuntimeException, py4j.protocol.Py4JJavaError)):
        window_funnel_levels(ev, ("A", "B"), 10, max_events_per_key=49).collect()
