"""Token-balanced shard assignment — laying a corpus out for training.

A training job reads shards of roughly equal *token* count (not equal doc
count: document lengths are heavy-tailed). Assigning shard ids needs the
global running token total in a canonical document order — a prefix sum,
which naive Spark code writes as one window over ALL rows
(``Window.orderBy(...)`` with no partition), collapsing 100 TB onto a
single task.

This module computes the prefix sum the scalable way (the classic
two-phase parallel scan):

1. **bucket partials** — docs are grouped into contiguous id buckets
   (``bucket = id div bucket_width``); one hash-aggregate computes each
   bucket's token sum.
2. **bucket offsets** — a running sum over the *bucket* rows (thousands of
   rows, not billions: a single-partition window here is O(n_buckets) and
   deliberate) yields each bucket's starting offset.
3. **local scan + join** — the per-bucket offset joins back (broadcast;
   the offset table is tiny) and an intra-bucket window — partitioned by
   bucket, so fully parallel — finishes the scan.

``shard_id = (global_prefix_before_doc) div target_tokens`` — exact
integer arithmetic end to end (no doubles: at 25T+ tokens a double's 53-bit
mantissa would misplace shard boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def token_balanced_shards(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    target_per_shard: int,
    bucket_width: int = 10_000,
) -> DataFrame:
    """Adds ``shard_id`` such that consecutive documents (by ``order_col``)
    accumulate into shards of ~``target_per_shard`` total ``weight_col``.

    A document lands in the shard its *starting* offset falls into, so every
    shard's total is < target + max_doc_weight and the assignment is a pure
    function of the input — reproducible across retries and engines.
    """
    w = F.col(weight_col).cast("long")
    bucketed = df.withColumn(
        "_bucket", F.expr(f"{order_col} div {bucket_width}").cast("long")
    )
    partials = bucketed.groupBy("_bucket").agg(F.sum(w).alias("_bsum"))
    # running sum over bucket rows only — O(n_buckets), intentionally tiny
    bw = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_bucket", F.coalesce(F.sum("_bsum").over(bw), F.lit(0)).alias("_offset")
    )
    iw = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(broadcast(offsets), "_bucket")
        .withColumn(
            "_prefix", F.col("_offset") + F.coalesce(F.sum(w).over(iw), F.lit(0))
        )
        .withColumn("shard_id", F.expr(f"_prefix div {target_per_shard}").cast("long"))
        .drop("_bucket", "_offset", "_prefix")
    )


def write_token_shards(
    df: DataFrame,
    path: str,
    weight_col: str,
    order_col: str,
    target_per_shard: int,
) -> None:
    """Materialize the corpus as ``shard_id=N/`` parquet partitions, each
    internally ordered by ``order_col``. The sort leads with the partition
    column — FileFormatWriter silently drops secondary sort keys otherwise
    (documented Spark quirk)."""
    token_balanced_shards(df, weight_col, order_col, target_per_shard).sortWithinPartitions(
        "shard_id", order_col
    ).write.partitionBy("shard_id").mode("overwrite").parquet(path)
