"""Catalog-wide oracle type audit (VERDICT r5 item 9).

The driver's t2 compare loads both result sets into a frame before
hashing values column-by-column.  DuckDB silently widens in ways the
frame then coerces to float64 — the classic case is a window
``SUM(BIGINT)`` → HUGEINT → ``decimal128(38,0)`` → float64 — so a query
whose *values* are byte-identical to Spark's still hash-mismatches
(r5's red ``docs_pack_sequences`` row).  Our local ``compare_query``
canonicalises ints leniently and never saw it.

This guard closes that gap *before* the driver does: for every oracled
catalog query it takes the Spark result schema (analysis only — the plan
is never executed) and the DuckDB result schema via Arrow, and asserts
the numeric families line up:

- Spark integral (byte/short/int/long)  → oracle must be an Arrow
  integer type, never float or decimal (HUGEINT lands here);
- Spark float/double                    → oracle must be Arrow
  float32/float64, never decimal or integer;
- everything else is left alone (string/date/bool/list compare fine).

Runs at sf0.001 so the one-time DuckDB ``LIMIT 0`` planning pass is
cheap.
"""

import os

import duckdb
import pyarrow as pa
import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (
    load_all,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    TABLES,
)

SF_DIR = os.environ.get("KICKHOUSE_TEST_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()
ORACLED = [name for name, spec in REGISTRY.items() if spec.oracle is not None]

_SPARK_INTEGRAL = {"byte", "short", "integer", "long"}
_SPARK_FLOATING = {"float", "double"}


def _oracle_arrow_schema(con: duckdb.DuckDBPyConnection, oracle: str) -> pa.Schema:
    # LIMIT 0 keeps planning (and therefore output types) but skips most
    # of the execution; DuckDB accepts a CTE inside a subquery.
    try:
        return con.execute(f"SELECT * FROM ({oracle}) _q LIMIT 0").arrow().schema
    except duckdb.Error:
        return con.execute(oracle).arrow().schema


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_numeric_types_match_spark(spark, duck, name):
    spec = REGISTRY[name]
    s_fields = {f.name: f.dataType.typeName() for f in spec.fn(spark, SF_DIR).schema}
    o_schema = _oracle_arrow_schema(duck, spec.oracle)
    o_fields = {f.name: f.type for f in o_schema}

    assert sorted(s_fields) == sorted(o_fields), (
        f"{name}: column sets differ — spark={sorted(s_fields)} "
        f"oracle={sorted(o_fields)}"
    )

    problems = []
    for col, s_type in s_fields.items():
        o_type = o_fields[col]
        if s_type in _SPARK_INTEGRAL:
            if not pa.types.is_integer(o_type):
                problems.append(
                    f"{col}: spark {s_type} but oracle {o_type} "
                    f"(cast the oracle expression to BIGINT — HUGEINT/decimal "
                    f"coerces to float64 in the driver's compare frame)"
                )
        elif s_type in _SPARK_FLOATING:
            if not pa.types.is_floating(o_type):
                problems.append(
                    f"{col}: spark {s_type} but oracle {o_type} "
                    f"(cast the oracle expression to DOUBLE)"
                )
    assert not problems, f"{name}: " + "; ".join(problems)


def test_money_sums_reduce_scale_before_double_cast(spark):
    """r10 sf1 sweep finding: a DECIMAL(·,6) sum whose scaled integer
    exceeds 2^53 casts to DIFFERENT doubles across engines (one vs two
    roundings). The engine reduces money sums to scale 2 (cents) before
    the double cast; this pins the behavior at the failing magnitude
    without needing the sf1 fixture."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    # 2.7864e10-ish sum at scale 6 — the exact magnitude class that
    # mismatched at sf1 (scaled int 2.79e16 > 2^53)
    target = Decimal("27864155010.941590")
    half = target / 2
    df = spark.createDataFrame(
        [(half,), (half,)], "v decimal(24,6)"
    )
    got = df.agg(
        F.sum("v").cast("decimal(38,2)").cast("double").alias("d")
    ).head()["d"]
    import duckdb

    want = duckdb.sql(
        "SELECT CAST(CAST(CAST('27864155010.941590' AS DECIMAL(24,6)) "
        "AS DECIMAL(38,2)) AS DOUBLE)"
    ).fetchone()[0]
    assert got == want == float(Decimal("27864155010.94"))

    # and WITHOUT the reduction the engines genuinely disagree at this
    # magnitude — the property the fix exists for (if this ever starts
    # passing, DuckDB fixed its cast and the pre-casts become optional)
    raw_spark = df.agg(F.sum("v").cast("double").alias("d")).head()["d"]
    raw_duck = duckdb.sql(
        "SELECT CAST(CAST('27864155010.941590' AS DECIMAL(25,6)) AS DOUBLE)"
    ).fetchone()[0]
    assert raw_spark == float(target)  # Spark: one correctly-rounded cast
    assert raw_duck != raw_spark
