"""Bucketed co-located joins: plan-level proof that the per-query shuffle
is gone (the write-once-shuffle-never-again contract)."""

import pytest

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, ["o_orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the whole point: neither side re-shuffles at query time
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_correctness(spark, sf_small, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, ["o_orderkey"])
    n = joined.count()
    expected = (
        load_table(spark, sf_small, "lineitem")
        .join(
            load_table(spark, sf_small, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == expected and n > 0


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    # hash-aggregate on the bucket key needs no Exchange either: the data
    # is already hash-distributed by o_orderkey
    plan = _plan(
        spark.table("b_lineitem").groupBy("o_orderkey").agg(F.sum("l_quantity"))
    )
    assert "Exchange" not in plan
