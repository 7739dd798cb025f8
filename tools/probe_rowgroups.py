"""Measure the fixture scan-floor claim (VERDICT r6 item 3 / BASELINE.md).

BASELINE.md attributes the 5-10x gap between Spark and in-process DuckDB
on OLAP singletons to the fixtures being ONE parquet row group — the unit
of scan parallelism, so a local[32] session decodes the fact table on a
single task. This probe measures instead of arguing: it rewrites the
sf0.1 fact tables (lineitem, orders, events) into 32 files (= 32 row
groups), re-runs the three singleton queries BASELINE.md discusses
against both layouts, and prints the exec times side by side.

Usage: python tools/probe_rowgroups.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (  # noqa: E402
    load_all,
)

QUERIES = ("pricing_summary", "revenue_by_nation", "validator_route_counts")
REWRITE = ("lineitem", "orders", "events")
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def time_query(spark, fn, sf_dir: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    tmp = tempfile.mkdtemp(prefix="rowgroup-probe-")
    try:
        for t in ALL_TABLES:
            src = f"{sf_dir}/{t}.parquet"
            if t in REWRITE:
                spark.read.parquet(src).repartition(int(cpus)).write.mode(
                    "overwrite"
                ).parquet(f"{tmp}/{t}.parquet")
            else:
                os.symlink(src, f"{tmp}/{t}.parquet")

        print(f"{'query':<28} {'1 row group':>12} {'32 files':>12} {'speedup':>8}")
        for name in QUERIES:
            fn = reg[name].fn
            orig = time_query(spark, fn, sf_dir)
            rewr = time_query(spark, fn, tmp)
            print(
                f"{name:<28} {orig:>11.3f}s {rewr:>11.3f}s "
                f"{orig / rewr:>7.2f}x"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
