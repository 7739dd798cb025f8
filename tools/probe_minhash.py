#!/usr/bin/env python
"""Round-4 probe: stage-level breakdown of minhash_lsh_pairs at sf0.1."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import get_spark
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
    shingle_rows,
    release_persisted,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_HASHES = 64
BAND_SIZE = 4


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s -> {out}")
    return out


def main():
    spark = get_spark(app_name="probe-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm scan

    # stage 1: shingle rows (window + distinct)
    sh = shingle_rows(docs, "text", "doc_id", 3)
    t("shingle_rows.count (no persist)", sh.count)

    exploded_h = sh.select("_id", F.xxhash64("_sh").alias("_h")).persist()
    t("exploded_h persist+count", exploded_h.count)

    # stage 2: signature aggregate
    sig = exploded_h.groupBy("_id").agg(
        *[F.min(F.xxhash64(F.lit(i), "_h")).alias(f"mh_{i}") for i in range(NUM_HASHES)]
    )
    t("signature.count", sig.count)
    sig = sig.persist()
    sig.count()

    # stage 3: banding + candidate join
    n_bands = NUM_HASHES // BAND_SIZE
    band_rows = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    left = band_rows.select(F.col("_id").alias("a_id"), "band", "bucket")
    right = band_rows.select(F.col("_id").alias("b_id"), "band", "bucket")
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    ).persist()
    t("candidates.count", candidates.count)

    # stage 4: verification
    sh_a = exploded_h.select(F.col("_id").alias("a_id"), "_h")
    sh_b = exploded_h.select(F.col("_id").alias("b_id"), "_h")
    inter = (
        candidates.join(sh_a, "a_id")
        .join(sh_b, ["b_id", "_h"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sizes = exploded_h.groupBy("_id").agg(F.count(F.lit(1)).alias("_size"))
    sizes_a = sizes.select(F.col("_id").alias("a_id"), F.col("_size").alias("_sa"))
    sizes_b = sizes.select(F.col("_id").alias("b_id"), F.col("_size").alias("_sb"))
    verified = (
        inter.join(sizes_a, "a_id")
        .join(sizes_b, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.col("_inter").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    t("verified.count", verified.count)

    n_ex = sh._jdf.queryExecution().executedPlan().toString().count("Exchange")
    print(f"shingle_rows plan exchanges: {n_ex}")
    print(sh._jdf.queryExecution().explainString("formatted"))
    release_persisted()


if __name__ == "__main__":
    main()
