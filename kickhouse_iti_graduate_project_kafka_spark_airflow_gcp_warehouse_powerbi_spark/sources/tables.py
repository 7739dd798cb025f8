"""Parquet table registry for the driver-generated fixture schema.

At scale these would be partitioned table roots (month/entity partitioning,
reference: ClickHouse DDL ``PARTITION BY toYYYYMM`` lines 144-225); the loader
is a plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and partition pruning (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension-sized tables — always broadcast-join these against facts.
SMALL_TABLES = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: tables that have carried TIMESTAMP(NANOS) columns in some fixture
#: vintages — Spark has no nanosecond timestamp type, so those read as long
#: (legacy conf) and are truncated to microseconds (integer division:
#: doubles cannot represent epoch-nanos exactly, and DuckDB truncates
#: rather than rounds). Later fixture vintages write TIMESTAMP(MICROS)
#: directly; the loader inspects the read schema and converts only when
#: the column actually surfaced as a long.
NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in nanos_cols:
            if isinstance(df.schema[c].dataType, LongType):
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
            elif isinstance(df.schema[c].dataType, TimestampNTZType):
                # TIMESTAMP(MICROS) vintage surfaces as TIMESTAMP_NTZ. The
                # naive wall clock is nominally UTC (same convention the
                # nanos vintage encoded as epoch micros). A bare NTZ→LTZ
                # cast interprets the wall clock in the *session* timezone
                # and would shift every instant under a non-UTC driver
                # session; shifting the NTZ wall clock into the session
                # timezone first makes the subsequent cast land on the
                # naive-as-UTC instant regardless of session timezone.
                tz = spark.conf.get("spark.sql.session.timeZone")
                df = df.withColumn(
                    c,
                    F.convert_timezone(F.lit("UTC"), F.lit(tz), F.col(c)).cast(
                        "timestamp"
                    ),
                )
            # else: already TimestampType (a micros-adjusted-to-UTC fixture
            # vintage) — an instant needs NO conversion; running the NTZ
            # shift here would double-shift under a non-UTC session tz
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture table as a temp view (for spark.sql plans)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
