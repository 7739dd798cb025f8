#!/usr/bin/env python
"""Round-4 probe: shingle-generation strategy shootout at sf0.1.

A: current window-lead path (shingle_rows)
B: higher-order-function transform path (_shingled + explode)
C: regex lookahead extraction (normalize ws, overlapping capture), distinct
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
    shingle_rows,
    _shingled,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shingle_rows_regex(df, text_col, id_col, n=3):
    pat = r"(?:^| )(?=((?:\S+ ){" + str(n - 1) + r"}\S+))"
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))).alias(
                "_sh"
            ),
        )
    )


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best {best:.3f}s -> {out}")
    return out


def main():
    spark = get_spark(app_name="probe-shingles")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()

    a = shingle_rows(docs, "text", "doc_id", 3)
    b = _shingled(docs, "text", "doc_id", 3).select(
        "_id", F.explode("_shingles").alias("_sh")
    )
    c = shingle_rows_regex(docs, "text", "doc_id", 3)

    t("A window-lead distinct", a.count)
    t("B HOF transform", b.count)
    t("C regex lookahead", c.count)

    # equality check A vs C
    diff1 = a.exceptAll(c).count()
    diff2 = c.exceptAll(a).count()
    print(f"A-C diff: {diff1}, C-A diff: {diff2}")

    # hashed variants feeding minhash: count distinct hashes
    ch = c.select("_id", F.xxhash64("_sh").alias("_h"))
    t("C hashed", ch.count)


if __name__ == "__main__":
    main()
