"""Rejected-message data lake: date-partitioned parquet (S5/W11).

The reference writes one whole parquet file per day and every dashboard
query rescans the full file (airflow/scripts/consume_kafka.py:54-58). We
write a *partitioned* lake (event_date=YYYY-MM-DD/) so date predicates
become partition pruning — at 100 TB a day-scoped DQ query touches one
partition, not the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_daily(df: DataFrame, path: str, mode: str = "append") -> None:
    """Append {topic, event_time, message} rows partitioned by event_date."""
    (
        df.withColumn("event_date", F.to_date("event_time"))
        .repartition("event_date")  # one writer wave per date partition
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Day-scoped read — the filter prunes to a single partition."""
    return spark.read.parquet(path).filter(F.col("event_date") == day)
