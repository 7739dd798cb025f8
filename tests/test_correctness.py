"""Golden oracle tests — every catalog query vs its DuckDB oracle.

Mirrors the driver's t2 gate (row count + columns + order-insensitive
values, columns sorted by name) at sf0.001 for speed; run with
``KICKHOUSE_TEST_SF=/root/testdata/sf0.01`` for the full-size check.
"""

import os

import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (
    load_all,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.testing import (
    compare_query,
)

SF_DIR = os.environ.get("KICKHOUSE_TEST_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()
ORACLED = [name for name, spec in REGISTRY.items() if spec.oracle is not None]
UNORACLED = [name for name, spec in REGISTRY.items() if spec.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    res = compare_query(spark, name, spec.fn, spec.oracle, SF_DIR)
    assert res.ok, (
        f"{name}: rows {res.spark_rows} vs {res.oracle_rows}, "
        f"cols_match={res.columns_match}, values_match={res.values_match}; {res.detail}"
    )


@pytest.mark.parametrize("name", UNORACLED)
def test_unoracled_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
