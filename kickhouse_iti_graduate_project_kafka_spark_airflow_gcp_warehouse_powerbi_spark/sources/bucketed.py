"""Bucketed table layout — co-located fact-to-fact joins without a shuffle.

At 100 TB the dominant cost of `lineitem ⋈ orders` is shuffling both facts
on the order key for every query that joins them. Bucketing pays that
shuffle ONCE at write time: both tables are hash-partitioned into the same
number of buckets on the join key and each bucket is written sorted, so
Catalyst plans a SortMergeJoin with **no Exchange on either side** (and no
per-query sort when the bucket sort matches the join key).

This is the Spark-native analogue of the reference warehouse's
ORDER BY-keyed MergeTree parts (ClickHouse DDL: tables keyed on the join
id), re-expressed as a write-time layout contract.

Usage contract:
- both sides bucketed by the SAME columns into the SAME bucket count;
- bucket count chosen for target-scale task size (e.g. 100 TB fact /
  4096 buckets ≈ 25 GB per bucket, split further by files);
- readers simply `spark.table(name)` — bucket metadata lives in the
  catalog, so co-location survives across sessions and jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    catalog table. Sorting by the bucket columns lets the merge join skip
    its per-query sort too."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With equal
    bucket counts the planner elides both Exchanges; the join runs
    bucket-aligned, one task per bucket pair."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
