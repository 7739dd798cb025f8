"""End-to-end corpus curation job: stage accounting and output layout."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/jobs")

from curate_corpus import curate  # noqa: E402


def test_curate_end_to_end(spark, sf_oracle, tmp_path):
    out = str(tmp_path / "gold")
    summary = curate(spark, sf_oracle, out, threshold=0.5, target_tokens=2000)

    # monotone shrinkage: every stage keeps a subset
    assert summary["input_docs"] >= summary["after_exact_dedup"] >= summary["after_neardup_dedup"]
    # the fixture corpus plants real dupes — the pipeline must actually drop some
    assert summary["after_neardup_dedup"] < summary["input_docs"]
    assert summary["n_shards"] >= 2

    # written layout: hive-partitioned by shard, readable, doc-unique
    dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(dirs) == summary["n_shards"]
    back = spark.read.parquet(out)
    assert back.count() == summary["after_neardup_dedup"]
    assert back.select("doc_id").distinct().count() == summary["after_neardup_dedup"]

    # redaction really happened: denylist terms are gone from the gold text
    assert back.filter(F.col("text").rlike(r"\b(key|hash|secret)\b")).count() == 0
    # shard totals respect the target bound (< target + max doc weight)
    totals = back.groupBy("shard_id").agg(F.sum("n_tok").alias("t"))
    max_w = back.agg(F.max("n_tok")).collect()[0][0]
    assert all(r["t"] < 2000 + max_w for r in totals.collect())
