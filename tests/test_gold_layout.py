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


def test_compact_preserves_null_partition_and_rows(spark, tmpdir):
    """r03 ADVICE: compaction must not drop rows whose partition value is
    NULL (__HIVE_DEFAULT_PARTITION__) — the count join is null-safe — and
    the bucket spread must be deterministic (no rand), so a re-run leaves
    identical content."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.gold_layout import (
        compact_partitions,
    )

    df = spark.createDataFrame(
        [("2026-01", 1), ("2026-01", 2), (None, 3), (None, 4), ("2026-02", 5)],
        "month string, v int",
    )
    write_gold(df, f"{tmpdir}/t", "month", ["v"])
    before = {(r["month"], r["v"]) for r in read_gold(spark, f"{tmpdir}/t").collect()}
    assert before == {("2026-01", 1), ("2026-01", 2), (None, 3), (None, 4), ("2026-02", 5)}

    stats = compact_partitions(spark, f"{tmpdir}/t", "month", ["v"], target_rows_per_file=2)
    assert stats["rows"] == 5
    after = {(r["month"], r["v"]) for r in read_gold(spark, f"{tmpdir}/t").collect()}
    assert after == before, "compaction lost or duplicated rows (null partition?)"

    # deterministic spread: compacting again is a no-op content-wise
    compact_partitions(spark, f"{tmpdir}/t", "month", ["v"], target_rows_per_file=2)
    again = {(r["month"], r["v"]) for r in read_gold(spark, f"{tmpdir}/t").collect()}
    assert again == before
