"""Gold-table physical layout: partitioning + in-file ordering (SURVEY §4).

The reference lays out facts as ``PARTITION BY toYYYYMM(event_date)`` with
``ORDER BY (event_date, league_sk, idEvent)`` and an 8192-row index
(ClickHouse DDL 143-146). The Spark/Parquet analogue:

- month partition column -> Hive-style directory partitioning (partition
  pruning on date predicates);
- ``sortWithinPartitions`` on the ORDER BY keys -> parquet row-group
  min/max statistics become selective (the data-skipping index analogue);
- one writer wave per partition via repartition on the partition column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_gold(
    df: DataFrame,
    path: str,
    partition_col: str,
    order_by: Sequence[str],
    mode: str = "overwrite",
) -> None:
    # the sort MUST lead with the partition column: FileFormatWriter requires
    # partition-column ordering and silently re-sorts (dropping the secondary
    # keys) when the incoming order doesn't start with it
    (
        df.repartition(F.col(partition_col))
        .sortWithinPartitions(partition_col, *order_by)
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_gold(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
