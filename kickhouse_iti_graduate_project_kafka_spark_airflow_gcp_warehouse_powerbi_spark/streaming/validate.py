"""Structured-Streaming validate-and-route — the reference's core job.

Re-expresses spark/jobs/validate_json.py (reference, 703 lines) as one
transform function shared by batch and streaming ("one transform, two
drivers", SURVEY.md §3.2), with the improvements SURVEY.md §3.1 calls out:

- watermarked exact dedup **enabled** (the reference designed a 48 h
  watermark + dropDuplicates on (pk, payload_hash) but left it disabled,
  validate_json.py:598-604);
- AQE left on; checkpointed sinks; 5 s processing-time trigger kept;
- a StreamingQueryListener instead of a status-polling thread
  (validate_json.py:686-700).

Source/sink factories support Kafka (production) and file/memory
(tests — this container has no broker). The Kafka paths use the exact
option surface of the reference: subscribePattern with negative lookahead,
earliest offsets, failOnDataLoss=false, idempotent producer
(validate_json.py:540-547, 676-680).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..functions.expressions import (
    composite_pk,
    payload_hash,
    repair_ingested_at,
    required_fields_ok,
    sport_ok,
)
from ..schemas import HASH_EXCLUDE

#: reference topic-subscription regex: everything under the namespace except
#: our own validated/rejected mirrors (validate_json.py:545)
SUBSCRIBE_PATTERN = r"^(?!validated\.|rejected\.)soccer\..*"

DEFAULT_TRIGGER = "5 seconds"  # validate_json.py:11
DEDUP_WATERMARK = "48 hours"  # validate_json.py:10


def kafka_source(
    spark: SparkSession,
    bootstrap: str,
    pattern: str = SUBSCRIBE_PATTERN,
) -> DataFrame:
    """S1: Kafka streaming source with regex subscription (reference:
    validate_json.py:540-547 — identical option surface)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", pattern)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
        .load()
    )


def file_json_source(
    spark: SparkSession, path: str, schema: T.StructType, max_files: int = 10
) -> DataFrame:
    """Test/dev source: JSON files with the same envelope columns a Kafka
    source would carry (topic, key, value, timestamp). Lets the whole
    pipeline run without a broker."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )


def validate_messages(
    msgs: DataFrame,
    payload_schema: T.StructType,
    required: list[str],
    type_pattern: str,
    pk_cols: list[str] | None = None,
    sport_field: str | None = None,
    sport_pattern: str = "(?i)soccer",
    entity_from_topic: str = r"^soccer\.(.+)$",
    dedup: bool = True,
) -> DataFrame:
    """The full P1-P12 expression chain over an envelope DataFrame with
    columns (topic, key, value:string, timestamp). Works identically on a
    batch or streaming input — the caller picks the driver.

    ``pk_cols`` is the entity's primary-key column list (schemas.PRIMARY_KEYS,
    reference: validate_json.py:53-67); it defaults to ``required`` only as a
    degenerate fallback. ``sport_field`` (schemas.SPORT_FIELD — supports
    nested paths like lookup_player.strSport) adds the case-insensitive
    sport predicate with tri-state squash (P9); entities without a sport
    column pass ``None`` and inherit the filter at the warehouse J1-J3 join.
    Returns columns: topic (routed), key (pk), value (re-serialized JSON),
    evt_ts, is_valid, parse_ok.
    """
    pk_cols = pk_cols or required
    schema = T.StructType(
        list(payload_schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    entity = F.regexp_extract("topic", entity_from_topic, 1)  # P1
    parsed = (
        msgs.withColumn("entity", entity)
        .withColumn("json_str", F.col("value").cast("string"))  # P13
        .withColumn(
            "data",
            F.from_json("json_str", schema, {"columnNameOfCorruptRecord": "_corrupt"}),
        )  # P3
    )
    flat = parsed.select(
        "topic", "entity", "json_str", "timestamp", "data", "data.*"
    )  # P4

    parse_ok = F.col("_corrupt").isNull()  # P5
    required_ok = required_fields_ok(required)  # P8
    type_ok = sport_ok("entity", type_pattern)  # entity whitelist
    is_valid = parse_ok & required_ok & type_ok
    if sport_field is not None:
        is_valid = is_valid & sport_ok(sport_field, sport_pattern)  # P9

    business_cols = [f.name for f in payload_schema.fields]
    ingested = repair_ingested_at(
        F.col("ingested_at") if "ingested_at" in business_cols else F.lit(None).cast("double"),
        F.col("timestamp"),
    )  # P6
    out = flat.select(
        # S2 routing: prefix the FULL original topic (reference emits
        # 'validated.soccer.event', validate_json.py:610-628) so the
        # rejected-lake REJECTED_PATTERN '^rejected\.soccer\..*' matches
        F.concat(
            F.when(is_valid, F.lit("validated.")).otherwise(F.lit("rejected.")),
            F.col("topic"),
        ).alias("topic"),
        F.when(parse_ok, composite_pk([F.col(c) for c in pk_cols]))
        .otherwise(F.sha2("json_str", 256))
        .alias("key"),  # P7 / P12
        F.to_json(F.struct(*[F.col(c) for c in business_cols])).alias("value"),  # P11
        # P10: envelope fields (ingested_at et al.) excluded, matching the
        # reference's EXCLUDE_FROM_HASH (validate_json.py:532-537) — a
        # re-sent payload with a fresh ingested_at must hash identically
        # or the dedup below silently no-ops
        payload_hash(business_cols, exclude=HASH_EXCLUDE).alias("payload_sha"),
        F.to_timestamp(F.from_unixtime(ingested)).alias("evt_ts"),
        is_valid.alias("is_valid"),
        parse_ok.alias("parse_ok"),
    )
    if dedup:
        # ST1 — the designed-but-disabled dedup, enabled (SURVEY §2.9).
        # Streaming uses dropDuplicatesWithinWatermark: plain dropDuplicates
        # only evicts state when the event-time column is in the key subset,
        # so the 48 h watermark would not bound state. Batch driver gets the
        # equivalent bounded-input dropDuplicates.
        out = out.withWatermark("evt_ts", DEDUP_WATERMARK)
        if out.isStreaming:
            out = out.dropDuplicatesWithinWatermark(["key", "payload_sha"])
        else:
            out = out.dropDuplicates(["key", "payload_sha"])
    return out


def validate_all_entities(
    msgs: DataFrame,
    entities: list[str] | None = None,
    dedup: bool = True,
) -> DataFrame:
    """The reference job's full topology: demux one multiplexed stream into
    per-entity branches (P2), validate each against its own schema/keys/
    sport path from the registry, and fold the branches back with
    unionByName(allowMissingColumns=True) — the 27-frame union
    (reference: validate_json.py:582-652; O3).

    Each branch's output already has the uniform (topic, key, value,
    payload_sha, evt_ts, is_valid, parse_ok) shape, so the union is a
    physical append — no shuffle (SURVEY §3.1: the whole pipeline is
    narrow)."""
    from functools import reduce

    from ..schemas import ENTITIES, PRIMARY_KEYS, REQUIRED_FIELDS, SPORT_FIELD, entity_schema

    entities = entities or list(ENTITIES)
    branches = []
    for e in entities:
        branch = msgs.filter(
            F.regexp_extract("topic", r"^soccer\.(.+)$", 1) == e  # P1+P2 demux
        )
        branches.append(
            validate_messages(
                branch,
                entity_schema(e),
                REQUIRED_FIELDS[e],
                type_pattern=f"(?i)^{e.replace('.', chr(92) + '.')}$",
                pk_cols=PRIMARY_KEYS[e],
                sport_field=SPORT_FIELD.get(e),
                dedup=dedup,
            )
        )
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), branches)


def routed_stream(routed: DataFrame, valid: bool) -> DataFrame:
    """Split one routed frame into the validated or rejected leg."""
    return routed.filter(F.col("is_valid") == valid).drop("is_valid", "parse_ok")


def start_validated_rejected_sinks(
    routed: DataFrame,
    checkpoint_root: str,
    kafka_bootstrap: str | None = None,
    memory_prefix: str | None = None,
    trigger: str = DEFAULT_TRIGGER,
) -> list[StreamingQuery]:
    """S2/S3: two sinks (validated-all, rejected-all), per-row topic routing,
    idempotent produce, per-query checkpoints (reference:
    validate_json.py:667-683). With ``memory_prefix`` the sinks are memory
    tables for tests."""
    queries = []
    for name, leg in (("validated", True), ("rejected", False)):
        df = routed_stream(routed, leg)
        writer = (
            df.writeStream.outputMode("append")
            .trigger(processingTime=trigger)
            .option("checkpointLocation", f"{checkpoint_root}/{name}")
            .queryName(f"{memory_prefix or 'route'}_{name}")
        )
        if kafka_bootstrap:
            writer = (
                writer.format("kafka")
                .option("kafka.bootstrap.servers", kafka_bootstrap)
                .option("kafka.enable.idempotence", "true")
            )
        else:
            writer = writer.format("memory")
        queries.append(writer.start())
    return queries
