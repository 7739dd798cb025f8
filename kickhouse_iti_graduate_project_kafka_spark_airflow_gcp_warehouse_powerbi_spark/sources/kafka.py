"""Kafka source/sink builders — the S-family operators (SURVEY.md §2.1).

This container has no broker, so everything here is a builder returning a
configured reader/writer; integration is exercised against a real Kafka in
deployment. The option surface mirrors the reference exactly:

- S1 streaming source: subscribePattern with negative lookahead, earliest
  offsets, failOnDataLoss=false (reference: spark/jobs/validate_json.py:540-547);
- S5 batch drain: bounded read with endingOffsets=latest — replaces the
  kafka-python consumer loop (reference: airflow/scripts/consume_kafka.py:30-61)
  with a parallel, offset-exact Spark batch read;
- S8 producer-shaped write: key = pk string, value = JSON document
  (reference: producers/common.py:35-42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REJECTED_PATTERN = r"^rejected\.soccer\..*"


def batch_drain(
    spark: SparkSession,
    bootstrap: str,
    pattern: str = REJECTED_PATTERN,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S5: drain matching topics up to the current end offsets as ONE batch
    DataFrame — every partition of every topic becomes a Spark input split
    (vs the reference's sequential 13-topic loop with a 10 s timeout each)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", pattern)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", "latest")
        .load()
    )


def drained_to_lake_rows(raw: DataFrame) -> DataFrame:
    """Shape a drained batch into the rejected-lake row format
    {topic, event_time, message} (reference: consume_kafka.py:46-52),
    with the Kafka record timestamp as event_time (faithful, unlike the
    reference's consume-time now())."""
    return raw.select(
        F.col("topic"),
        F.col("timestamp").alias("event_time"),
        F.col("value").cast("string").alias("message"),
    )


def producer_shaped(df: DataFrame, key_col: str, payload_cols: list[str]) -> DataFrame:
    """S8: (key, value) projection for a Kafka write — key is the pk string,
    value the JSON document."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("value"),
    )


def write_kafka_batch(df: DataFrame, bootstrap: str, topic: str | None = None) -> None:
    """Batch Kafka sink; routes per-row when a 'topic' column exists
    (S2 semantics), else to the fixed ``topic``."""
    writer = df.write.format("kafka").option("kafka.bootstrap.servers", bootstrap)
    if topic is not None:
        writer = writer.option("topic", topic)
    writer.save()
