"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the engine's query
catalog (one registered entry per implemented operator family from
SURVEY.md §2 + the LLM-pipeline extensions). ``entry`` runs the flagship
star-join query on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (  # noqa: E402
    load_all,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (hash-dependent
    operators like SimHash/LSH-ANN) get the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
