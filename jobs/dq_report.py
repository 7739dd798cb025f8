#!/usr/bin/env python
"""Job: run the data-quality OLAP suite and print one JSON document.

    python jobs/dq_report.py [--sf-dir /root/testdata/sf0.01] [--tags A1 WF1]

The batch analogue of the reference's daily 06:00 triage DAG + DuckDB
notebook (airflow/dags/save_invalid_topics_as_paquert.py; duckdb_olap.ipynb)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (
    load_all,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--tags", nargs="*", default=["A1", "A2", "A3", "A8", "WF1", "J4"])
    ap.add_argument("--limit", type=int, default=20, help="max rows per query in the report")
    args = ap.parse_args()

    spark = get_spark(app_name="kickhouse-dq-report")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for name, spec in load_all().items():
        if not set(spec.tags) & set(args.tags):
            continue
        rows = spec.fn(spark, args.sf_dir).limit(args.limit).collect()
        report[name] = [r.asDict() for r in rows]
    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
