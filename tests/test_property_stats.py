"""Property-based tests for the r11 statistical/map operators: random
inputs (including heavy ties and duplicate keys) checked against plain-
Python references. Hypothesis drives the data; Spark runs once per
example via cached small frames."""

import math
from collections import defaultdict

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.maps import (
    agg_map,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.stats import (
    ks_2samp,
    mann_whitney_u,
)

# tight value alphabet -> dense ties, the regime where rank tests break
_vals = st.sampled_from([1.0, 2.0, 2.5, 3.0, 5.0])
_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _mw_ref(a, b):
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n1 = len(a)
    return float(ranks[:n1].sum() - n1 * (n1 + 1) / 2.0)


@_slow
@given(
    a=st.lists(_vals, min_size=1, max_size=8),
    b=st.lists(_vals, min_size=1, max_size=8),
)
def test_mann_whitney_u_matches_reference_under_ties(spark, a, b):
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, s string")
    row = mann_whitney_u(
        df, F.col("v"), F.col("s") == "a", F.col("s") == "b"
    ).first()
    assert row["u_stat"] == pytest.approx(
        _mw_ref(np.array(a), np.array(b)), abs=1e-9
    )


@_slow
@given(
    a=st.lists(_vals, min_size=1, max_size=8),
    b=st.lists(_vals, min_size=1, max_size=8),
)
def test_ks_2samp_matches_reference_under_ties(spark, a, b):
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, s string")
    row = ks_2samp(df, F.col("v"), F.col("s") == "a", F.col("s") == "b").first()
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    assert row["d_stat"] == pytest.approx(
        float(np.abs(f1 - f2).max()), abs=1e-9
    )


_keys = st.sampled_from(["a", "b", "c"])
_entry = st.tuples(_keys, st.integers(min_value=-5, max_value=9))
_rowmaps = st.lists(
    st.lists(_entry, min_size=1, max_size=3), min_size=1, max_size=6
)


@_slow
@given(rowmaps=_rowmaps, combine=st.sampled_from(["sum", "min", "max"]))
def test_agg_map_matches_dict_reference(spark, rowmaps, combine):
    rows = [
        ([k for k, _ in entries], [float(v) for _, v in entries])
        for entries in rowmaps
    ]
    df = spark.createDataFrame(rows, "ks array<string>, vs array<double>")
    row = agg_map(df, F.col("ks"), F.col("vs"), combine=combine).first()
    ref: dict = defaultdict(list)
    for entries in rowmaps:
        for k, v in entries:
            ref[k].append(float(v))
    fn = {"sum": math.fsum, "min": min, "max": max}[combine]
    expect = {k: fn(vs) for k, vs in ref.items()}
    got = dict(zip(row["map_keys"], row["map_values"]))
    assert list(row["map_keys"]) == sorted(expect)
    assert got == pytest.approx(expect)


def test_mann_whitney_all_tied_yields_null_z(spark):
    # every value identical -> one rank block, variance 0: z must be
    # NULL (not an ANSI divide-by-zero), U still defined
    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (1.0, "b"), (1.0, "b")], "v double, s string"
    )
    row = mann_whitney_u(
        df, F.col("v"), F.col("s") == "a", F.col("s") == "b"
    ).first()
    assert row["z_stat"] is None
    assert row["u_stat"] == pytest.approx(2.0)  # n1*n2/2 under full ties


def test_mann_whitney_single_row_group_yields_nulls(spark):
    # n == 1 makes the tie-correction denominator n*(n-1) zero; the
    # whole job used to die with an ANSI DIVIDE_BY_ZERO (advisor-found)
    df = spark.createDataFrame([(1.0, "a")], "v double, s string")
    row = mann_whitney_u(
        df, F.col("v"), F.col("s") == "a", F.col("s") == "b"
    ).first()
    assert row["n1"] == 1 and row["n2"] == 0
    assert row["u_stat"] == pytest.approx(0.0)
    assert row["z_stat"] is None


def test_ks_empty_sample_yields_null_d(spark):
    # one empty sample -> zero CDF denominator: D undefined, not a crash
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a")], "v double, s string"
    )
    row = ks_2samp(df, F.col("v"), F.col("s") == "a", F.col("s") == "b").first()
    assert row["n1"] == 2 and row["n2"] == 0
    assert row["d_stat"] is None


def test_rank_tests_ignore_null_measures(spark):
    # NULL measures carry no rank information and must not form a rank /
    # CDF block (Spark windows order NULLs FIRST, DuckDB LAST — keeping
    # them would diverge; ClickHouse skips NULLs in these aggregates)
    with_null = spark.createDataFrame(
        [(None, "a"), (1.0, "a"), (2.0, "b")], "v double, s string"
    )
    without = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b")], "v double, s string"
    )
    for op in (mann_whitney_u, ks_2samp):
        r1 = op(
            with_null, F.col("v"), F.col("s") == "a", F.col("s") == "b"
        ).first()
        r2 = op(
            without, F.col("v"), F.col("s") == "a", F.col("s") == "b"
        ).first()
        assert r1.asDict() == r2.asDict(), op.__name__


def test_degenerate_groups_yield_nulls_not_ansi_errors(spark):
    # advisor-found class: every ratio statistic whose denominator can
    # be zero on a degenerate group must surface NULL (ClickHouse emits
    # nan/inf), never abort the job under ANSI mode
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.stats import (
        bounding_ratio,
        cramers_v,
        pop_moments,
        simple_linreg,
        theils_u,
    )

    const_x = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 1.0, 5.0)], "g string, x double, y double"
    )
    lr = simple_linreg(const_x, F.col("x"), F.col("y"), by=("g",)).first()
    assert lr["slope"] is None and lr["intercept"] is None and lr["r2"] is None

    br = bounding_ratio(
        const_x, F.col("x"), F.col("y"), F.col("y"), by=("g",)
    ).first()
    assert br["bounding_ratio"] is None

    const_v = spark.createDataFrame(
        [("g", 3.0), ("g", 3.0)], "g string, v double"
    )
    pm = pop_moments(const_v, F.col("v"), by=("g",)).first()
    assert pm["stddev_pop"] == pytest.approx(0.0)
    assert pm["skew_pop"] is None and pm["kurt_pop"] is None

    one_cat = spark.createDataFrame(
        [("x", "p"), ("x", "q")], "a string, b string"
    )
    cv = cramers_v(one_cat, F.col("a"), F.col("b")).first()
    assert cv["cramers_v"] is None
    tu = theils_u(one_cat, F.col("a"), F.col("b")).first()
    assert tu["theils_u"] is None


def test_agg_map_rejects_length_mismatch(spark):
    # ClickHouse's sumMap errors on keys/values size mismatch; silently
    # zip-padding with NULL entries would corrupt per-key sums
    df = spark.createDataFrame(
        [(["x", "y"], [1.0])], "ks array<string>, vs array<double>"
    )
    with pytest.raises(Exception, match="equal length"):
        agg_map(df, F.col("ks"), F.col("vs")).collect()


def test_agg_map_empty_group_contract(spark):
    # all-empty/NULL groups drop by default (documented); the
    # emit_empty_groups flag keeps them with empty aligned arrays
    df = spark.createDataFrame(
        [("a", ["x"], [1.0]), ("b", [], []), ("c", None, None)],
        "g string, ks array<string>, vs array<double>",
    )
    dropped = agg_map(df, F.col("ks"), F.col("vs"), by=("g",)).collect()
    assert sorted(r["g"] for r in dropped) == ["a"]
    kept = agg_map(
        df, F.col("ks"), F.col("vs"), by=("g",), emit_empty_groups=True
    ).collect()
    by_g = {r["g"]: (list(r["map_keys"]), list(r["map_values"])) for r in kept}
    assert by_g == {
        "a": (["x"], [1.0]),
        "b": ([], []),
        "c": ([], []),
    }


def test_rolling_distinct_operator_matches_bruteforce(spark):
    import itertools
    from pyspark.sql import functions as F
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.rolling import (
        rolling_distinct,
    )

    rows = [(d, u) for d, u in [(0, 1), (0, 2), (1, 1), (3, 3), (5, 1),
                                 (5, 4), (6, 2), (9, 1)]]
    df = spark.createDataFrame(rows, "d long, u long")
    out = {
        r["period"]: r["rolling_uniques"]
        for r in rolling_distinct(df, F.col("d"), F.col("u"), window=3).collect()
    }
    for p in range(0, 10):
        expect = len({u for d, u in rows if p - 2 <= d <= p})
        assert out.get(p, 0) == expect, p
    assert min(out) == 0 and max(out) == 9  # clamped to observed span


def test_rolling_distinct_window_one_is_per_period(spark):
    from pyspark.sql import functions as F
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.rolling import (
        rolling_distinct,
    )

    df = spark.createDataFrame([(0, 1), (0, 1), (2, 2)], "d long, u long")
    out = {
        r["period"]: r["rolling_uniques"]
        for r in rolling_distinct(df, F.col("d"), F.col("u"), window=1).collect()
    }
    assert out == {0: 1, 2: 1}


def test_rolling_distinct_rejects_bad_window(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.rolling import (
        rolling_distinct,
    )

    df = spark.createDataFrame([(0, 1)], "d long, u long")
    with _pytest.raises(ValueError, match="window"):
        rolling_distinct(df, F.col("d"), F.col("u"), window=0)
