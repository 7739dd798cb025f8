#!/usr/bin/env python
"""Job: run the streaming validate-and-route pipeline.

Kafka mode (production):
    python jobs/validate_stream.py --kafka broker:9092 --checkpoint /chk
File mode (dev/test, no broker):
    python jobs/validate_stream.py --source-dir /data/envelopes --checkpoint /chk
Broker smoke test (self-skipping):
    python jobs/validate_stream.py --kafka broker:9092 --smoke --checkpoint /chk

``--smoke`` runs the S1-S3/S5/S8/S9 integration end-to-end against a REAL
broker: produce the 13-entity fixture envelopes to ``soccer.*`` topics
(Spark batch Kafka write; topics are provisioned by the produce under the
brokers' auto-create, since no admin client library exists here), run the
full demux->validate->route stream for one drain, and assert the routed
counts equal the same transform applied as a batch. Exit codes: 0 = pass,
1 = counts mismatched, 3 = no broker reachable (skip), 4 = Spark Kafka
connector not on the classpath (skip). The skip paths let this run in any
environment — in the broker-less container it reports 3 before a
SparkSession is even created.

Replaces the reference's spark-submit job (spark/jobs/validate_json.py) with
the engine's shared transform; dedup is ON (the reference designed it but
left it disabled)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.schemas import (
    PRIMARY_KEYS,
    REQUIRED_FIELDS,
    SPORT_FIELD,
    entity_schema,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming import (
    file_json_source,
    kafka_source,
    start_validated_rejected_sinks,
    validate_messages,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.validate import (
    validate_all_entities,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.monitor import (
    attach,
)

ENVELOPE = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def broker_reachable(bootstrap: str, timeout: float = 3.0) -> bool:
    """Cheap TCP probe of the first bootstrap endpoint — decides skip
    BEFORE paying SparkSession startup."""
    import socket

    first = bootstrap.split(",")[0].strip()
    host, _, port = first.partition(":")
    try:
        socket.create_connection((host, int(port or "9092")), timeout=timeout).close()
        return True
    except (OSError, ValueError):
        return False


def kafka_smoke(bootstrap: str, checkpoint: str) -> int:
    """Produce fixtures -> stream-validate from the broker -> compare
    against the batch twin. See module docstring for exit codes."""
    import json

    from pyspark.sql import functions as F

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.fixtures import (
        entity_fixtures,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.kafka import (
        write_kafka_batch,
    )

    spark = get_spark(app_name="kickhouse-kafka-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # one envelope frame: topic = soccer.<entity>, key = first pk, value = doc
    fx = entity_fixtures()
    rows = [
        (f"soccer.{entity}", str(doc.get(PRIMARY_KEYS[entity][0])), json.dumps(doc))
        for entity, docs in fx.items()
        for doc in docs
    ]
    envelopes = spark.createDataFrame(rows, "topic string, key string, value string")

    # S8/S9: batch produce; the write provisions the 13 topics via broker
    # auto-create (no admin client library in this environment)
    try:
        write_kafka_batch(envelopes, bootstrap)
    except Exception as e:
        if "Failed to find data source: kafka" in str(e) or "ClassNotFound" in str(e):
            print(json.dumps({"smoke": "skip", "reason": "kafka connector not on classpath"}))
            return 4
        raise

    # batch twin: same transform, same envelopes — the expected counts
    expected = (
        validate_all_entities(
            envelopes.withColumn("timestamp", F.current_timestamp())
        )
        .groupBy(F.col("topic").startswith("validated.").alias("ok"))
        .count()
        .collect()
    )
    want = {("validated" if r["ok"] else "rejected"): r["count"] for r in expected}

    # S1-S3: stream from the broker through the same topology, one drain
    routed = validate_all_entities(kafka_source(spark, bootstrap))
    queries = start_validated_rejected_sinks(
        routed, checkpoint, kafka_bootstrap=None, memory_prefix="smoke"
    )
    for q in queries:
        q.processAllAvailable()
    got = {
        kind: spark.sql(f"SELECT COUNT(*) AS n FROM smoke_{kind}").collect()[0]["n"]
        for kind in ("validated", "rejected")
    }
    for q in queries:
        q.stop()

    # >= because the smoke may run against a broker holding earlier runs'
    # messages (topics are never torn down here); exact equality on a
    # fresh broker
    ok = got["validated"] >= want.get("validated", 0) and got["rejected"] >= want.get(
        "rejected", 0
    ) and (got["validated"] + got["rejected"]) >= len(rows)
    print(json.dumps({"smoke": "ok" if ok else "mismatch", "want": want, "got": got}))
    return 0 if ok else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kafka", help="bootstrap servers (Kafka mode)")
    ap.add_argument("--source-dir", help="JSON envelope dir (file mode)")
    ap.add_argument("--entity", default="event", help="entity for file mode")
    ap.add_argument(
        "--all-entities", action="store_true",
        help="run the full 13-entity demux -> validate -> union topology",
    )
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--type-pattern", default="(?i)^event$")
    ap.add_argument(
        "--run-for", type=float, default=None,
        help="seconds to run before draining and stopping (dev/file mode); "
        "default runs until terminated",
    )
    ap.add_argument(
        "--smoke", action="store_true",
        help="broker integration self-test; skips (exit 3) when no broker",
    )
    args = ap.parse_args()

    if args.smoke:
        if not args.kafka:
            ap.error("--smoke requires --kafka")
        if not broker_reachable(args.kafka):
            import json

            print(json.dumps({"smoke": "skip", "reason": f"no broker at {args.kafka}"}))
            raise SystemExit(3)
        raise SystemExit(kafka_smoke(args.kafka, args.checkpoint))

    spark = get_spark(app_name="kickhouse-validate-stream")
    attach(spark)
    if args.kafka:
        msgs = kafka_source(spark, args.kafka)
    elif args.source_dir:
        msgs = file_json_source(spark, args.source_dir, ENVELOPE)
    else:
        ap.error("one of --kafka / --source-dir is required")
    if args.all_entities:
        routed = validate_all_entities(msgs)
    else:
        routed = validate_messages(
            msgs,
            entity_schema(args.entity),
            REQUIRED_FIELDS[args.entity],
            args.type_pattern,
            pk_cols=PRIMARY_KEYS[args.entity],
            sport_field=SPORT_FIELD.get(args.entity),
        )
    queries = start_validated_rejected_sinks(
        routed, args.checkpoint, kafka_bootstrap=args.kafka, memory_prefix="job"
    )
    if args.run_for is not None:
        for q in queries:
            q.processAllAvailable()
        for name in ("job_validated", "job_rejected"):
            n = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0]["n"]
            print(f"{name}: {n} rows")
        for q in queries:
            q.stop()
        return
    spark.streams.awaitAnyTermination()


if __name__ == "__main__":
    main()
