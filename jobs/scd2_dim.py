#!/usr/bin/env python
"""Job: build or incrementally maintain an SCD Type-2 dimension.

Batch backfill (rebuild from the full change history):

    python jobs/scd2_dim.py backfill --events /lake/events --dim /lake/dim_state \\
        --keys user_id --attr event_type --ts ts --tiebreak event_id

Streaming maintenance (tail a parquet change-stream directory):

    python jobs/scd2_dim.py stream --events /lake/events_stream --dim /lake/dim_state \\
        --checkpoint /lake/_ckpt/dim_state --keys user_id --attr event_type --ts ts

One transform, two drivers (the ST8 discipline): both subcommands run the
same ``upsert_scd2_batch`` merge; ``backfill`` simply feeds it the whole
history as one batch via the bootstrap path.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.scd2 import (
    maintain_scd2_stream,
    upsert_scd2_batch,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["backfill", "stream"])
    ap.add_argument("--events", required=True, help="parquet dir of change events")
    ap.add_argument("--dim", required=True, help="dimension output path")
    ap.add_argument("--checkpoint", help="stream checkpoint dir (stream mode)")
    ap.add_argument("--keys", required=True, help="comma-separated key columns")
    ap.add_argument("--attr", required=True, help="tracked attribute column")
    ap.add_argument("--ts", required=True, help="event-time column")
    ap.add_argument("--tiebreak", default="", help="comma-separated tiebreak columns")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--trigger", default="5 seconds")
    args = ap.parse_args()

    keys = args.keys.split(",")
    tiebreak = [c for c in args.tiebreak.split(",") if c]
    spark = get_spark(app_name="kickhouse-scd2-dim")

    if args.mode == "backfill":
        upsert_scd2_batch(
            spark,
            spark.read.parquet(args.events),
            args.dim,
            keys,
            args.attr,
            args.ts,
            tiebreak,
            args.buckets,
        )
        print(f"backfilled {args.dim}")
        return

    if not args.checkpoint:
        ap.error("--checkpoint is required in stream mode")
    schema = spark.read.parquet(args.events).schema
    stream = spark.readStream.schema(schema).parquet(args.events)
    q = maintain_scd2_stream(
        stream,
        args.dim,
        args.checkpoint,
        keys,
        args.attr,
        args.ts,
        tiebreak,
        args.buckets,
        args.trigger,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
