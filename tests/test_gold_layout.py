"""Physical gold layout: month partitioning + partition pruning proof and
sort-within-partitions ordering (SURVEY §4 — the PARTITION BY toYYYYMM /
ORDER BY analogue)."""

import io
import contextlib
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.gold_layout import (
    read_gold,
    write_gold,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kickhouse-gold-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_gold_partitions_and_prunes(spark, sf_small, tmpdir):
    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyyMM")
    )
    write_gold(orders, f"{tmpdir}/orders", "order_month", ["o_orderdate", "o_orderkey"])

    back = read_gold(spark, f"{tmpdir}/orders")
    assert back.count() == orders.count()

    # date predicate must become a partition filter (pruned scan)
    q = back.filter(F.col("order_month") == "199506")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "order_month" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    expected = orders.filter(F.col("order_month") == "199506").count()
    assert q.count() == expected


def test_write_gold_sorted_within_partition(spark, sf_small, tmpdir):
    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyyMM")
    )
    write_gold(orders, f"{tmpdir}/o2", "order_month", ["o_orderdate", "o_orderkey"])
    one = (
        read_gold(spark, f"{tmpdir}/o2")
        .filter(F.col("order_month") == "199506")
        .select("o_orderdate", "o_orderkey")
        .collect()
    )
    vals = [(r["o_orderdate"], r["o_orderkey"]) for r in one]
    assert vals == sorted(vals)  # row order inside the partition is the sort key
