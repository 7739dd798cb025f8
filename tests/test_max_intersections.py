"""maxIntersections sweep semantics (operators/intervals.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.intervals import (
    max_intersections,
)


def _run(spark, rows):
    """rows: (key, s, e) closed intervals."""
    df = spark.createDataFrame(rows, "key long, s long, e long")
    out = max_intersections(df, "key", F.col("s"), F.col("e"))
    return {r.key: (r.max_overlap, r.first_peak_pos) for r in out.collect()}


def test_touching_intervals_do_not_double_count(spark):
    # [0,5] and [6,10] never coexist; [0,5] and [5,10] share day 5
    assert _run(spark, [(1, 0, 5), (1, 6, 10)]) == {1: (1, 0)}
    assert _run(spark, [(2, 0, 5), (2, 5, 10)]) == {2: (2, 5)}


def test_peak_and_first_position(spark):
    rows = [(1, 0, 10), (1, 2, 4), (1, 3, 4), (1, 8, 9)]
    # overlap 3 first reached at 3 ([0,10],[2,4],[3,4])
    assert _run(spark, rows) == {1: (3, 3)}


def test_point_intervals_and_keys_isolated(spark):
    rows = [(1, 5, 5), (1, 5, 5), (2, 5, 5)]
    assert _run(spark, rows) == {1: (2, 5), 2: (1, 5)}


def test_invalid_interval_raises(spark):
    import py4j.protocol
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1, 5, 3)], "key long, s long, e long")
    with pytest.raises((SparkRuntimeException, py4j.protocol.Py4JJavaError)):
        max_intersections(df, "key", F.col("s"), F.col("e")).collect()


def test_matches_bruteforce_on_random_intervals(spark):
    rng = random.Random(77)
    rows = []
    for k in range(8):
        for _ in range(rng.randint(1, 30)):
            s = rng.randint(0, 60)
            rows.append((k, s, s + rng.randint(0, 15)))
    got = _run(spark, rows)
    for k in {r[0] for r in rows}:
        ivs = [(s, e) for (kk, s, e) in rows if kk == k]
        lo = min(s for s, _ in ivs)
        hi = max(e for _, e in ivs)
        conc = {t: sum(1 for s, e in ivs if s <= t <= e) for t in range(lo, hi + 1)}
        m = max(conc.values())
        pos = min(t for t, c in conc.items() if c == m)
        assert got[k] == (m, pos), k


def test_interval_length_sum_union_semantics(spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.intervals import (
        interval_length_sum,
    )

    # half-open [s, e): overlaps merge, gaps excluded, empty adds 0
    rows = [(1, 0, 5), (1, 3, 8), (1, 10, 12), (1, 12, 12), (2, 4, 4)]
    df = spark.createDataFrame(rows, "key long, s long, e long")
    out = {
        r.key: r.covered
        for r in interval_length_sum(df, "key", F.col("s"), F.col("e")).collect()
    }
    assert out == {1: 10, 2: 0}  # [0,8)=8 + [10,12)=2


def test_interval_length_sum_matches_bruteforce(spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.intervals import (
        interval_length_sum,
    )

    rng = random.Random(99)
    rows = []
    for k in range(6):
        for _ in range(rng.randint(1, 25)):
            s = rng.randint(0, 80)
            rows.append((k, s, s + rng.randint(0, 20)))
    df = spark.createDataFrame(rows, "key long, s long, e long")
    out = {
        r.key: r.covered
        for r in interval_length_sum(df, "key", F.col("s"), F.col("e")).collect()
    }
    for k in {r[0] for r in rows}:
        cover = set()
        for kk, s, e in rows:
            if kk == k:
                cover.update(range(s, e))
        assert out[k] == len(cover), k
