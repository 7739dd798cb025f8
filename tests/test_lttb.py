"""LTTB downsampling (operators/lttb.py): Spark fold vs an independent
Python reference vs the generated DuckDB recursive-CTE oracle."""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pandas as pd
import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.lttb import (
    lttb,
    lttb_oracle_sql,
)


def _ref(points, n_out):
    """Straight LTTB with exact arithmetic (Fraction averages compare
    identically to the integer-scaled scores the operators use)."""
    pts = sorted(points)
    n = len(pts)
    if n <= n_out:
        return sorted(pts)
    b_count = n_out - 2
    mid = pts[1:-1]
    m = len(mid)
    buckets: list[list[tuple[int, int]]] = [[] for _ in range(b_count)]
    for j, p in enumerate(mid):
        buckets[(j * b_count) // m].append(p)
    out = [pts[0]]
    prev = pts[0]
    for bi, bucket in enumerate(buckets):
        if bi + 1 < b_count:
            nxt = buckets[bi + 1]
            ax = Fraction(sum(x for x, _ in nxt), len(nxt))
            ay = Fraction(sum(y for _, y in nxt), len(nxt))
        else:
            ax, ay = Fraction(pts[-1][0]), Fraction(pts[-1][1])
        best, best_a = None, Fraction(-1)
        for (x, y) in bucket:
            a = abs(
                (Fraction(prev[0]) - ax) * (Fraction(y) - prev[1])
                - (Fraction(prev[0]) - x) * (ay - prev[1])
            )
            if a > best_a:
                best, best_a = (x, y), a
        out.append(best)
        prev = best
    out.append(pts[-1])
    return sorted(out)


def _spark_lttb(spark, series, n_out):
    rows = [(s, x, y) for s, pts in series.items() for (x, y) in pts]
    df = spark.createDataFrame(rows, "s string, x long, y long")
    got = lttb(df, "s", "x", "y", n_out).collect()
    out: dict[str, list] = {s: [] for s in series}
    for r in got:
        out[r.s].append((r.x, r.y))
    return {s: sorted(v) for s, v in out.items()}


def test_passthrough_small_series(spark):
    pts = [(0, 5), (10, 7), (20, 3)]
    assert _spark_lttb(spark, {"a": pts}, 5) == {"a": sorted(pts)}


def test_hand_case_peak_survives(spark):
    # 8 points, n_out=4 -> 2 middle buckets of 3; the spike at x=3 must
    # be selected (largest triangle), the flat points dropped
    pts = [(0, 0), (1, 1), (2, 1), (3, 90), (4, 1), (5, 1), (6, 1), (7, 0)]
    got = _spark_lttb(spark, {"a": pts}, 4)["a"]
    assert (3, 90) in got and (0, 0) in got and (7, 0) in got
    assert len(got) == 4
    assert got == _ref(pts, 4)


def test_duplicate_x_raises(spark):
    import py4j.protocol
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 1, 2)], "s string, x long, y long"
    )
    with pytest.raises((SparkRuntimeException, py4j.protocol.Py4JJavaError)):
        lttb(df, "s", "x", "y", 3).collect()


def test_rejects_tiny_n_out(spark):
    df = spark.createDataFrame([("a", 1, 1)], "s string, x long, y long")
    with pytest.raises(ValueError):
        lttb(df, "s", "x", "y", 2)


@pytest.mark.parametrize("n_out", [3, 4, 7, 20])
def test_matches_reference_and_duckdb_on_random_series(spark, n_out):
    rng = random.Random(n_out * 1000 + 7)
    series = {}
    for si in range(6):
        xs = sorted(rng.sample(range(0, 500), rng.randint(2, 80)))
        series[f"s{si}"] = [(x, rng.randint(0, 1000)) for x in xs]
    got = _spark_lttb(spark, series, n_out)
    want = {s: _ref(pts, n_out) for s, pts in series.items()}
    assert got == want

    rows = [(s, x, y) for s, pts in series.items() for (x, y) in pts]
    pdf = pd.DataFrame(rows, columns=["s", "x", "y"])
    con = duckdb.connect()
    try:
        con.register("raw", pdf)
        sql = lttb_oracle_sql(
            n_out, base_sql="SELECT s, x, y FROM raw", series_alias="s"
        )
        o = con.execute(sql).fetchall()
    finally:
        con.close()
    o_by: dict[str, list] = {s: [] for s in series}
    for s, x, y in o:
        o_by[s].append((x, y))
    assert {s: sorted(v) for s, v in o_by.items()} == want
