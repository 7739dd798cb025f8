"""Token-balanced sharding: prefix-sum correctness vs a sequential scan,
shard-size invariants, and the partitioned writer layout."""

import os

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
    token_balanced_shards,
    write_token_shards,
)

TARGET = 500


def _fixture(spark, n=937, seed=5):
    # deterministic heavy-tailed weights, ids with gaps (ids need not be dense)
    rows = [(i * 3, (i * 7919 + seed) % 97 + (113 if i % 50 == 0 else 1)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long"), rows


def test_matches_sequential_scan(spark):
    df, rows = _fixture(spark)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in token_balanced_shards(df, "n_tok", "doc_id", TARGET, bucket_width=64).collect()
    }
    prefix = 0
    for doc_id, w in sorted(rows):
        assert got[doc_id] == prefix // TARGET, doc_id
        prefix += w


def test_shard_totals_bounded(spark):
    df, rows = _fixture(spark)
    max_w = max(w for _, w in rows)
    totals = (
        token_balanced_shards(df, "n_tok", "doc_id", TARGET, bucket_width=64)
        .groupBy("shard_id")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    )
    # a doc lands in the shard its START falls into -> total < target + max_w
    assert all(r["t"] < TARGET + max_w for r in totals)
    # shards are contiguous: ids 0..max with none skipped
    ids = sorted(r["shard_id"] for r in totals)
    assert ids == list(range(len(ids)))


def test_writer_partition_layout(spark, tmp_path):
    df, _ = _fixture(spark, n=200)
    path = str(tmp_path / "shards")
    write_token_shards(df, path, "n_tok", "doc_id", TARGET)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    assert len(dirs) > 1
    back = spark.read.parquet(path)
    assert back.count() == 200
    # partition pruning: the shard filter appears as a partition filter, and
    # the pruned read returns only shard 0's docs
    one = back.filter(F.col("shard_id") == 0)
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "shard_id" in plan
    seq = sorted(r["doc_id"] for r in one.collect())
    assert seq and seq == sorted(
        r["doc_id"]
        for r in token_balanced_shards(df, "n_tok", "doc_id", TARGET)
        .filter(F.col("shard_id") == 0)
        .collect()
    )
