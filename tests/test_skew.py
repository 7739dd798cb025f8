"""Salted aggregation / salted replicated join — results must be identical
to the unsalted plans (equivalence is the whole point of salting)."""

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


def test_salted_aggregate_equivalent(spark, sf_small):
    ev = load_table(spark, sf_small, "events")  # user_id is the 'hot' key
    plain = {
        (r["user_id"]): (r["cnt"], r["total"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total"))
        .collect()
    }
    salted = {
        (r["user_id"]): (r["cnt"], r["total"])
        for r in salted_aggregate(
            ev,
            ["user_id"],
            {"cnt": F.count(F.lit(1)),
             "total": F.sum(F.col("value").cast("decimal(14,2)"))},
            {"cnt": F.sum("cnt"),
             "total": F.sum("total").cast("double")},
            n_salts=16,
            unique_col="event_id",
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_spreads_hot_key(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    # phase-1 groups per key must exceed 1 for keys with many rows
    salted = ev.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)).cast("int")
    )
    fan = (
        salted.groupBy("user_id", "__salt")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_partials"))
        .agg(F.max("n_partials").alias("mx"))
        .collect()[0]["mx"]
    )
    assert fan > 4  # hot keys genuinely spread over multiple partials


def test_salted_broadcast_left_equivalent(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    cust = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_broadcast_left(orders, cust, "o_custkey", n_salts=8, unique_col="o_orderkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r["c_mktsegment"], r["count"]) for r in plain} == {
        (r["c_mktsegment"], r["count"]) for r in salted
    }
