"""Compaction job: rewrite an append table keeping the newest row per key —
the ClickHouse background-merge analogue (SURVEY §4 latest-per-key storage),
including the read-back equivalence guarantee: reads through the gold view
are identical before and after compaction."""

import shutil
import tempfile

import pytest

from pyspark.sql import Row

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.latest import (
    compact_latest,
    latest_per_key,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kickhouse-compact-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_compaction_preserves_latest_view(spark, tmpdir):
    rows = [
        Row(k="a", v=1, updated_at=1),
        Row(k="a", v=3, updated_at=3),
        Row(k="a", v=2, updated_at=2),
        Row(k="b", v=9, updated_at=5),
        Row(k="b", v=8, updated_at=4),
    ]
    append_path, compact_path = f"{tmpdir}/append", f"{tmpdir}/compact"
    spark.createDataFrame(rows).write.parquet(append_path)

    before = {
        (r["k"], r["v"])
        for r in latest_per_key(spark.read.parquet(append_path), ["k"], ["updated_at"]).collect()
    }

    compact_latest(spark.read.parquet(append_path), ["k"], ["updated_at"]).write.parquet(
        compact_path
    )
    compacted = spark.read.parquet(compact_path)
    assert compacted.count() == 2  # one row per key survives

    after = {
        (r["k"], r["v"])
        for r in latest_per_key(compacted, ["k"], ["updated_at"]).collect()
    }
    assert before == after == {("a", 3), ("b", 9)}
