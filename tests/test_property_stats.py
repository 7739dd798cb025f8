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
    a=st.lists(_vals, min_size=2, max_size=8),
    b=st.lists(_vals, min_size=2, max_size=8),
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
    a=st.lists(_vals, min_size=2, max_size=8),
    b=st.lists(_vals, min_size=2, max_size=8),
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
