"""Catalog queries driving the parts-table (MergeTree) lifecycle.

Each query BUILDS a real on-disk parts table from the fixture (memoized
per process+sf_dir so a 160-query sweep pays the build once), then reads
it back — so the driver's oracle gate covers the persisted lifecycle
(insert → commit → FINAL / time travel), not just an in-memory plan.
The oracles replay the engine semantics closed-form over the raw orders
view: part sequence k+1 holds the ``o_orderkey % 3 == k`` slice, so
"newest part wins, then version column" is exactly a ROW_NUMBER over
``(o_orderkey % 3) DESC, o_orderkey DESC``.

Ref parity: ClickHouse DDL 143-146 (MergeTree family), README.md:96-133
(insert blocks → parts with retry dedup), README.md:475-477 (FINAL-style
latest-state reads).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.parts import create_parts_table, insert_into_parts, read_parts
from ..sources.tables import load_table

_BUILT: dict[tuple[str, str], str] = {}


def _orders_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )


def _replacing_table(spark: SparkSession, sf_dir: str) -> str:
    """orders as a replacing table, inserted in 3 batches by orderkey mod 3."""
    key = (sf_dir, "replacing")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_replacing"
        create_parts_table(
            path, engine="replacing", key_cols=("custkey",), version_col="orderkey"
        )
        orders = _orders_slim(spark, sf_dir)
        for k in range(3):
            insert_into_parts(orders.filter(F.col("orderkey") % 3 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


def _summing_table(spark: SparkSession, sf_dir: str) -> str:
    """customer spend as a summing table: exact DECIMAL money + a unit
    counter column, so merge-time sums are order-independent."""
    key = (sf_dir, "summing")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_summing"
        create_parts_table(
            path,
            engine="summing",
            key_cols=("custkey",),
            sum_cols=("total_spend", "n_orders"),
        )
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("total_spend"),
            F.lit(1).cast("long").alias("n_orders"),
        )
        for k in range(3):
            insert_into_parts(orders.filter(F.col("custkey") % 3 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_replacing_final",
    bench=True,
    tags=("S10", "A6", "mergetree", "replacing-final"),
    oracle="""
    SELECT custkey, orderkey, status, totalprice
    FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               o_orderstatus AS status, o_totalprice AS totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY (o_orderkey % 3) DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def orders_parts_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree FINAL through the persisted lifecycle: orders
    land in three insert batches (parts); FINAL keeps, per customer, the
    row from the newest part, tie-broken by the version column — replayed
    closed-form by the oracle's window over the mod-3 part assignment."""
    path = _replacing_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "custkey", "orderkey", "status", "totalprice"
    )


@register(
    "orders_parts_summing_final",
    bench=False,
    tags=("S10", "A1", "mergetree", "summing-final"),
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def orders_parts_summing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree FINAL: per-customer spend accumulated across three
    parts — exact-decimal money and a summed unit counter, so the merge
    result equals a plain GROUP BY regardless of part boundaries."""
    path = _summing_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "custkey",
        F.col("total_spend").cast("double").alias("total_spend"),
        "n_orders",
    )


@register(
    "orders_parts_timetravel",
    bench=False,
    tags=("S10", "A10", "mergetree", "time-travel"),
    oracle="""
    SELECT t.v AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders, (VALUES (1), (2), (3)) AS t(v)
    WHERE o_orderkey % 3 < t.v
    GROUP BY t.v
    """,
)
def orders_parts_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: each retained version is a consistent snapshot — the
    cumulative mod-3 slices — so (count, exact revenue) per version is
    closed-form. Reads version pins, not the latest manifest."""
    path = _replacing_table(spark, sf_dir)
    legs = []
    for v in (1, 2, 3):
        legs.append(
            read_parts(spark, path, version=v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("totalprice").cast("decimal(14,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .withColumn("version", F.lit(v))
        )
    df = legs[0]
    for leg in legs[1:]:
        df = df.unionByName(leg)
    return df.select("version", "n_rows", "revenue")
