#!/usr/bin/env python
"""Capture explain("formatted") for catalog queries into plans/<tag>/.

Usage: python tools/capture_plans.py --tag r12 --suffix after [names...]
With no names, captures every bench-flagged query. Engine session (the
same configs the bench runs under) so the plans match what the bench
executes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (  # noqa: E501
    get_spark,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (  # noqa: E501
    load_all,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    names = args.names or sorted(n for n, s in registry.items() if s.bench)
    spark = get_spark(app_name="kickhouse-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
