"""Validate-and-route pipeline as a batch plan (the reference's core job).

The reference's single Spark job validates 13 JSON entity streams and routes
each message to `validated.*` or `rejected.*` (reference: spark/jobs/
validate_json.py:540-683). This module runs the exact same expression chain
(SURVEY.md §2.2 P1-P13) over the fixture `events` table treated as a message
stream:

- `props` is the raw JSON payload (`json_str`);
- messages with ``event_id % 13 == 0`` are corrupted (last char dropped) to
  exercise the parse-failure split (P5) and parse-error synthesis (P12);
- `event_type` plays the role of `strSport`: the '(click|view|signup|
  purchase)' whitelist is the case-insensitive regex predicate with
  tri-state squash (P9 — NULL input must route to rejected, not vanish);
- `k <= 80` plays the required-range business rule.

The streaming twin of this plan (same expressions, readStream) lives in
``streaming/validate.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import register
from ..functions.expressions import composite_pk, payload_hash, repair_ingested_at, sport_ok
from ..sources.tables import load_table

#: payload schema + explicit corrupt-record column: Spark's from_json yields a
#: struct of NULLs (not a NULL struct) for malformed input, so parse failure
#: is detected via columnNameOfCorruptRecord — the robust P5 split.
PAYLOAD_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("_corrupt", T.StringType())]
)
FROM_JSON_OPTIONS = {"columnNameOfCorruptRecord": "_corrupt"}

#: analogous to the reference's validated-type whitelist (validate_json.py:518-530)
TYPE_PATTERN = "(?i)^(click|view|signup|purchase)$"


def validated_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full validate-and-route pipeline, returning one row per message with
    its route topic, pk, payload hash, and repaired ingest time."""
    from ..operators.spread import spread_for_cpu

    # the parse-and-hash chain (from_json + 2x sha2 per row) is CPU-bound
    # and narrow; a one-row-group events table would serialize it on one
    # core — spread broadcast-small inputs first (no-op at real scale)
    ev = spread_for_cpu(load_table(spark, sf_dir, "events"))
    # deterministic corruption of every 13th message (P5/P12 coverage)
    json_str = F.when(
        F.col("event_id") % 13 == 0, F.expr("substring(props, 1, length(props) - 1)")
    ).otherwise(F.col("props"))
    msgs = ev.select(
        "event_id", "user_id", "event_type", "value", "ts", json_str.alias("json_str")
    )

    data = F.from_json("json_str", PAYLOAD_SCHEMA, FROM_JSON_OPTIONS)  # P3
    parsed = msgs.withColumn("data", data).withColumn("k", F.col("data.k"))

    parse_ok = F.col("data._corrupt").isNull()  # P5: parse-failure split
    required_ok = F.col("k").isNotNull()  # P8
    type_ok = sport_ok("event_type", TYPE_PATTERN)  # P9 tri-state squash
    range_ok = F.when(F.col("k") <= 80, F.lit(True)).otherwise(F.lit(False))
    is_valid = parse_ok & required_ok & type_ok & range_ok

    pk = F.when(
        parse_ok, composite_pk(["event_id", "user_id"])  # P7
    ).otherwise(F.sha2("json_str", 256))  # P12: parse-error record synthesis
    return parsed.select(
        F.concat(
            F.when(is_valid, F.lit("validated.")).otherwise(F.lit("rejected.")),
            F.col("event_type"),
        ).alias("topic"),  # S2-style per-row topic routing
        pk.alias("pk"),
        payload_hash(  # P10: canonical (name-sorted) payload hash
            ["event_id", "user_id", "event_type", "value", "k"]
        ).alias("payload_sha"),
        repair_ingested_at(F.col("value"), F.col("ts")).alias("ingested_at"),  # P6
        is_valid.alias("is_valid"),
        parse_ok.alias("parse_ok"),
    )


@register(
    "validator_route_counts",
    bench=True,
    tags=("P3", "P5", "P6", "P7", "P8", "P9", "P10", "P12", "S2"),
    oracle="""
    WITH msgs AS (
        SELECT event_id, user_id, event_type, value, ts,
               CASE WHEN event_id % 13 = 0
                    THEN SUBSTRING(props, 1, LENGTH(props) - 1)
                    ELSE props END AS json_str
        FROM events
    ), parsed AS (
        SELECT *,
               json_valid(json_str) AS parse_ok,
               CASE WHEN json_valid(json_str)
                    THEN CAST(json_extract_string(json_str, '$.k') AS BIGINT)
                    END AS k
        FROM msgs
    ), routed AS (
        SELECT CASE WHEN parse_ok AND k IS NOT NULL
                         AND regexp_matches(event_type,
                                            '^(click|view|signup|purchase)$', 'i')
                         AND k <= 80
                    THEN 'validated.' || event_type
                    ELSE 'rejected.' || event_type END AS topic,
               CASE WHEN parse_ok
                    THEN COALESCE(CAST(event_id AS VARCHAR), '') || '|'
                         || COALESCE(CAST(user_id AS VARCHAR), '')
                    ELSE sha256(json_str) END AS pk,
               COALESCE(CAST(event_id AS VARCHAR), '') || '#'
                   || COALESCE(CAST(event_type AS VARCHAR), '') || '#'
                   || COALESCE(CAST(k AS VARCHAR), '') || '#'
                   || COALESCE(CAST(user_id AS VARCHAR), '') || '#'
                   || COALESCE(CAST(value AS VARCHAR), '') AS payload_key,
               CAST(FLOOR(EPOCH(ts)) AS DOUBLE) AS ingested_at
        FROM parsed
    )
    SELECT topic, COUNT(*) AS n,
           COUNT(DISTINCT pk) AS n_pk,
           COUNT(DISTINCT payload_key) AS n_payloads,
           MIN(ingested_at) AS min_ingested,
           MAX(ingested_at) AS max_ingested
    FROM routed GROUP BY topic
    """,
)
def validator_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing counts per output topic with pk/payload-hash cardinalities.

    The oracle reproduces the routing logic in SQL; hash *values* are
    engine-specific (sha2-of-canonical-JSON vs delimited concat) but both are
    injective over the payload columns, so the DISTINCT counts must agree —
    exactly the dedup-identity property the reference relies on
    (validate_json.py:598-604).
    """
    routed = validated_routes(spark, sf_dir)
    return routed.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("pk").alias("n_pk"),
        F.count_distinct("payload_sha").alias("n_payloads"),
        F.min("ingested_at").alias("min_ingested"),
        F.max("ingested_at").alias("max_ingested"),
    )


@register(
    "validator_dedup_exact",
    tags=("ST1", "A6"),
    oracle="""
    WITH msgs AS (
        SELECT event_id, user_id,
               COALESCE(CAST(event_id AS VARCHAR), '') || '|'
                   || COALESCE(CAST(user_id AS VARCHAR), '') AS pk
        FROM events
    )
    SELECT COUNT(*) AS n_messages, COUNT(DISTINCT pk) AS n_unique
    FROM msgs
    """,
)
def validator_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup identity counts on (pk) — the batch analogue of the
    watermarked streaming dropDuplicates (reference: validate_json.py:598-604,
    designed-but-disabled; our streaming module enables it)."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.withColumn("pk", composite_pk(["event_id", "user_id"]))
    return keyed.agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.count_distinct("pk").alias("n_unique"),
    )
