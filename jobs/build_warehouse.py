#!/usr/bin/env python
"""Job: batch-build the star-schema warehouse from bronze entity parquet.

    python jobs/build_warehouse.py --bronze-root /lake/bronze --out /lake/gold

Bronze layout: one parquet dir per entity (league/, team/, event/, ...).
Writes every dim/fact partitioned+sorted per the reference's physical layout
(PARTITION BY month, ORDER BY (event keys); ClickHouse DDL 143-146)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans.entity_warehouse import (
    build_warehouse,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.schemas import (
    ENTITIES,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.gold_layout import (
    write_gold,
)

#: fact -> (partition column, in-file sort keys) per DDL 143-226
LAYOUT = {
    "fact_event": ("event_month", ["scheduled_date", "league_sk", "idEvent"]),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bronze-root", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = get_spark(app_name="kickhouse-build-warehouse")
    bronze = {}
    for e in ENTITIES:
        path = os.path.join(args.bronze_root, e.replace(".", "_"))
        if os.path.isdir(path):
            bronze[e] = spark.read.parquet(path)
    tables = build_warehouse(bronze)
    for name, df in tables.items():
        out = os.path.join(args.out, name)
        if name in LAYOUT:
            part, order = LAYOUT[name]
            write_gold(df, out, part, order)
        else:
            df.write.mode("overwrite").parquet(out)
        print(f"wrote {name} -> {out}")


if __name__ == "__main__":
    main()
