"""Unit tests for operators/stats.py — every statistic re-derived with
NumPy from first principles on small frames (independent of the DuckDB
oracle path, which tests/test_correctness.py covers via the catalog)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.stats import (
    bounding_ratio,
    cramers_v,
    ks_2samp,
    mann_whitney_u,
    pop_moments,
    simple_linreg,
    theils_u,
    ttest,
)

A = [12.1, 7.4, 9.9, 14.2, 8.8, 11.5, 10.0, 10.0]
B = [6.0, 9.1, 7.7, 5.5, 10.0, 8.2]


@pytest.fixture(scope="module")
def two_sample(spark):
    rows = [(float(v), True) for v in A] + [(float(v), False) for v in B]
    return spark.createDataFrame(rows, "v double, grp boolean")


def test_welch_ttest_matches_numpy(two_sample):
    row = ttest(two_sample, F.col("v"), F.col("grp"), kind="welch").first()
    a, b = np.array(A), np.array(B)
    se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se)
    deg = se**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["t_stat"] == pytest.approx(t, rel=1e-12)
    assert row["df_deg"] == pytest.approx(deg, rel=1e-12)


def test_student_ttest_matches_numpy(two_sample):
    row = ttest(two_sample, F.col("v"), F.col("grp"), kind="student").first()
    a, b = np.array(A), np.array(B)
    n1, n2 = len(a), len(b)
    sp = ((n1 - 1) * a.var(ddof=1) + (n2 - 1) * b.var(ddof=1)) / (n1 + n2 - 2)
    t = (a.mean() - b.mean()) / math.sqrt(sp * (1 / n1 + 1 / n2))
    assert row["t_stat"] == pytest.approx(t, rel=1e-12)
    assert row["df_deg"] == n1 + n2 - 2


def test_ttest_rejects_unknown_kind(two_sample):
    with pytest.raises(ValueError, match="welch.*student"):
        ttest(two_sample, F.col("v"), F.col("grp"), kind="Welch")


def _mw_reference(a, b):
    """Tie-corrected U1 and z, straight from the textbook definition."""
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # mid-rank, 1-based
        i = j
    n1, n2 = len(a), len(b)
    r1 = ranks[: len(a)].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    _, counts = np.unique(allv, return_counts=True)
    ties = float((counts**3 - counts).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    return u1, z


def test_mann_whitney_with_ties(spark):
    # deliberate cross-sample AND within-sample ties
    a = np.array([1.0, 2.0, 2.0, 3.0, 5.0, 5.0])
    b = np.array([2.0, 4.0, 5.0, 6.0, 6.0])
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, s string")
    row = mann_whitney_u(
        df, F.col("v"), F.col("s") == "a", F.col("s") == "b"
    ).first()
    u1, z = _mw_reference(a, b)
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["u_stat"] == pytest.approx(u1, abs=1e-12)
    assert row["z_stat"] == pytest.approx(z, rel=1e-12)


def test_ks_2samp_matches_reference(spark):
    a = np.array([1.0, 2.0, 2.0, 3.0, 5.0])
    b = np.array([2.0, 4.0, 5.0, 6.0])
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, s string")
    row = ks_2samp(df, F.col("v"), F.col("s") == "a", F.col("s") == "b").first()
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    assert row["d_stat"] == pytest.approx(float(np.abs(f1 - f2).max()), abs=1e-12)


def test_cramers_v_perfect_association(spark):
    # b is a function of a -> V = 1 exactly
    rows = [("x", "p")] * 4 + [("y", "q")] * 3 + [("z", "r")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    row = cramers_v(df, F.col("a"), F.col("b")).first()
    assert row["cramers_v"] == pytest.approx(1.0, abs=1e-12)
    assert row["n"] == 12


def test_cramers_v_independence(spark):
    # exact product structure -> chi2 = 0
    rows = [
        (a, b)
        for a in ("x", "y")
        for b in ("p", "q")
        for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    row = cramers_v(df, F.col("a"), F.col("b")).first()
    assert row["chi2"] == pytest.approx(0.0, abs=1e-12)


def test_theils_u_bounds(spark):
    # x fully determined by y -> U = 1; independent -> U = 0
    dep = spark.createDataFrame(
        [("s1", "p")] * 3 + [("s2", "q")] * 5, "x string, y string"
    )
    assert theils_u(dep, F.col("x"), F.col("y")).first()["theils_u"] == (
        pytest.approx(1.0, abs=1e-12)
    )
    ind = spark.createDataFrame(
        [(x, y) for x in ("s1", "s2") for y in ("p", "q")],
        "x string, y string",
    )
    assert theils_u(ind, F.col("x"), F.col("y")).first()["theils_u"] == (
        pytest.approx(0.0, abs=1e-12)
    )


def test_simple_linreg_exact_line(spark):
    # y = 3x - 2 exactly -> slope 3, intercept -2, r2 = 1
    df = spark.createDataFrame(
        [(float(x), 3.0 * x - 2.0) for x in range(10)], "x double, y double"
    )
    row = simple_linreg(df, F.col("x"), F.col("y")).first()
    assert row["slope"] == pytest.approx(3.0, abs=1e-12)
    assert row["intercept"] == pytest.approx(-2.0, abs=1e-10)
    assert row["r2"] == pytest.approx(1.0, abs=1e-12)


def test_bounding_ratio_pins_boundary_ties(spark):
    # two rows tie at min x and two at max x; the tiebreak id decides:
    # first = (x=0, id=1) -> y=10, last = (x=4, id=9) -> y=50
    rows = [
        (0.0, 1, 10.0),
        (0.0, 2, 99.0),
        (2.0, 5, 30.0),
        (4.0, 8, 77.0),
        (4.0, 9, 50.0),
    ]
    df = spark.createDataFrame(rows, "x double, id long, y double")
    row = bounding_ratio(df, F.col("x"), F.col("y"), F.col("id")).first()
    assert row["bounding_ratio"] == pytest.approx((50.0 - 10.0) / 4.0)


def test_pop_moments_match_numpy(spark):
    vals = [1.5, 2.5, 2.5, 4.0, 7.25, 9.0, 3.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = pop_moments(df, F.col("v")).first()
    a = np.array(vals)
    m2 = ((a - a.mean()) ** 2).mean()
    m3 = ((a - a.mean()) ** 3).mean()
    m4 = ((a - a.mean()) ** 4).mean()
    assert row["stddev_pop"] == pytest.approx(math.sqrt(m2), rel=1e-12)
    assert row["skew_pop"] == pytest.approx(m3 / m2**1.5, rel=1e-12)
    assert row["kurt_pop"] == pytest.approx(m4 / m2**2, rel=1e-12)


def test_ttest_grouped_runs_per_group(spark):
    rows = [("g1", float(v), v > 9) for v in A] + [
        ("g2", float(v), v > 8) for v in B
    ]
    df = spark.createDataFrame(rows, "g string, v double, hi boolean")
    out = {
        r["g"]: r
        for r in ttest(df, F.col("v"), F.col("hi"), by=("g",)).collect()
    }
    assert set(out) == {"g1", "g2"}
    assert out["g1"]["n1"] + out["g1"]["n2"] == len(A)
    assert out["g2"]["n1"] + out["g2"]["n2"] == len(B)


def test_mann_whitney_grouped_matches_per_group(spark):
    a1, b1 = np.array([1.0, 2.0, 2.0, 9.0]), np.array([2.0, 3.0])
    a2, b2 = np.array([5.0, 5.0, 6.0]), np.array([4.0, 5.0, 7.0, 7.0])
    rows = (
        [("g1", float(v), "a") for v in a1]
        + [("g1", float(v), "b") for v in b1]
        + [("g2", float(v), "a") for v in a2]
        + [("g2", float(v), "b") for v in b2]
    )
    df = spark.createDataFrame(rows, "g string, v double, s string")
    out = {
        r["g"]: r
        for r in mann_whitney_u(
            df, F.col("v"), F.col("s") == "a", F.col("s") == "b", by=("g",)
        ).collect()
    }
    for g, (a, b) in {"g1": (a1, b1), "g2": (a2, b2)}.items():
        u1, z = _mw_reference(a, b)
        assert out[g]["u_stat"] == pytest.approx(u1, abs=1e-12), g
        assert out[g]["z_stat"] == pytest.approx(z, rel=1e-12), g


def test_ks_grouped_partitions_independently(spark):
    rows = [("g1", 1.0, "a"), ("g1", 2.0, "b"), ("g2", 5.0, "a"),
            ("g2", 5.0, "b"), ("g2", 6.0, "a"), ("g2", 7.0, "b")]
    df = spark.createDataFrame(rows, "g string, v double, s string")
    out = {
        r["g"]: r["d_stat"]
        for r in ks_2samp(
            df, F.col("v"), F.col("s") == "a", F.col("s") == "b", by=("g",)
        ).collect()
    }
    assert out["g1"] == pytest.approx(1.0)  # disjoint singletons
    a, b = np.array([5.0, 6.0]), np.array([5.0, 7.0])
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), grid, side="right") / 2
    f2 = np.searchsorted(np.sort(b), grid, side="right") / 2
    assert out["g2"] == pytest.approx(float(np.abs(f1 - f2).max()))
