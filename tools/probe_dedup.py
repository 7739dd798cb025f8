#!/usr/bin/env python
"""Round-4 probe: cold vs shared timings for the dedup family at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import load_all
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators import dedup as _dedup
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans import curation as _curation

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FAMILY = [
    "docs_dup_clusters",
    "docs_ngram_jaccard_pairs",
    "docs_dedup_survivors",
    "docs_minhash_lsh_pairs",
]


def clear():
    _curation.clear_component_cache()
    _dedup.clear_pair_cache()
    _dedup.release_persisted()


def timed(spec, spark):
    t0 = time.perf_counter()
    df = spec.fn(spark, SF_DIR)
    t1 = time.perf_counter()
    df.collect()
    t2 = time.perf_counter()
    return round(t1 - t0, 3), round(t2 - t1, 3)


def main():
    registry = load_all()
    spark = get_spark(app_name="probe-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JIT etc
    for name in FAMILY:
        registry[name].fn(spark, SF_DIR).count()
    clear()
    print("=== COLD (caches cleared before each) ===")
    for name in FAMILY:
        clear()
        p, e = timed(registry[name], spark)
        print(f"{name}: plan={p} exec={e} total={round(p+e,3)}")
    clear()
    print("=== SHARED (family in order, caches persist) ===")
    t0 = time.perf_counter()
    for name in FAMILY:
        p, e = timed(registry[name], spark)
        print(f"{name}: plan={p} exec={e} total={round(p+e,3)}")
    print(f"family_total={round(time.perf_counter()-t0,3)}")
    clear()


if __name__ == "__main__":
    main()
