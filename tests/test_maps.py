"""Unit tests for operators/maps.py (ClickHouse -Map combinator family)."""

import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.maps import (
    agg_map,
)


@pytest.fixture(scope="module")
def mapped(spark):
    rows = [
        ("g1", ["a", "b"], [1.0, 10.0]),
        ("g1", ["b", "c"], [2.0, 5.0]),
        ("g2", ["a"], [7.0]),
    ]
    return spark.createDataFrame(
        rows, "g string, ks array<string>, vs array<double>"
    )


def test_sum_map_combines_per_key(mapped):
    out = {
        r["g"]: (r["map_keys"], r["map_values"])
        for r in agg_map(
            mapped, F.col("ks"), F.col("vs"), by=("g",), combine="sum"
        ).collect()
    }
    assert out["g1"] == (["a", "b", "c"], [1.0, 12.0, 5.0])
    assert out["g2"] == (["a"], [7.0])


def test_min_max_map(mapped):
    mn = agg_map(
        mapped, F.col("ks"), F.col("vs"), by=("g",), combine="min"
    ).collect()
    mx = agg_map(
        mapped, F.col("ks"), F.col("vs"), by=("g",), combine="max"
    ).collect()
    g1min = next(r for r in mn if r["g"] == "g1")
    g1max = next(r for r in mx if r["g"] == "g1")
    assert g1min["map_values"] == [1.0, 2.0, 5.0]
    assert g1max["map_values"] == [1.0, 10.0, 5.0]


def test_agg_map_rejects_unknown_combine(mapped):
    with pytest.raises(ValueError, match="combine must be"):
        agg_map(mapped, F.col("ks"), F.col("vs"), combine="avg")


def test_agg_map_global_group(mapped):
    row = agg_map(mapped, F.col("ks"), F.col("vs"), combine="sum").first()
    assert row["map_keys"] == ["a", "b", "c"]
    assert row["map_values"] == [8.0, 12.0, 5.0]
