#!/usr/bin/env python
"""Job: semantic (embedding-space) dedup over the corpus.

    python jobs/semdedup_corpus.py mark --out /tmp/sem [--tau 0.95] \
        [--n-cells 16] [--iters 3] [--sf-dir DIR] [--ivf-path /tmp/ivf]
    python jobs/semdedup_corpus.py survivors --out /tmp/sem ...
    python jobs/semdedup_corpus.py incremental --out /tmp/sem \
        [--batch-mod 10] ...

``mark`` writes the per-vector prune marks (operators/semdedup.py) to
``{out}/marks``; ``survivors`` additionally writes the surviving corpus
rows to ``{out}/survivors``; ``incremental`` classifies the ``vec_id %
batch_mod == 0`` slice as an arriving batch against the rest
(first-seen-wins, corpus-vs-batch attribution). ``--ivf-path`` reuses a
persisted coarse quantizer (jobs/ann_index.py build) so neither re-tau
runs nor ingest batches refit k-means. One JSON line per invocation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(
    spark,
    sf_dir: str,
    out: str,
    mode: str = "mark",
    tau: float = 0.95,
    n_cells: int = 16,
    iters: int = 3,
    batch_mod: int = 10,
    ivf_path: str | None = None,
) -> dict:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.semdedup import (
        semdedup,
        semdedup_incremental,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )

    centroids = None
    if ivf_path is not None:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
            load_centroids,
        )

        centroids = load_centroids(spark, ivf_path)

    emb = load_table(spark, sf_dir, "embeddings")
    if mode == "incremental":
        batch = emb.filter(F.col("vec_id") % batch_mod == 0)
        corpus = emb.filter(F.col("vec_id") % batch_mod != 0)
        marks = semdedup_incremental(
            batch, corpus, tau=tau, centroids=centroids,
            n_cells=n_cells, iters=iters,
        )
        marks.write.mode("overwrite").parquet(f"{out}/marks")
        back = spark.read.parquet(f"{out}/marks")
        agg = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("pruned_by").eqNullSafe("corpus").cast("long")),
                F.lit(0),
            ).alias("c"),
            F.coalesce(
                F.sum(F.col("pruned_by").eqNullSafe("batch").cast("long")),
                F.lit(0),
            ).alias("b"),
        ).collect()[0]
        return {
            "mode": mode, "out": out, "tau": tau,
            "n_batch": agg["n"],
            "pruned_by_corpus": agg["c"], "pruned_by_batch": agg["b"],
        }

    marks = semdedup(
        emb, tau=tau, centroids=centroids, n_cells=n_cells, iters=iters
    )
    marks.write.mode("overwrite").parquet(f"{out}/marks")
    back = spark.read.parquet(f"{out}/marks")
    stats = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.col("is_pruned").cast("long")), F.lit(0)).alias("p"),
    ).collect()[0]
    result = {
        "mode": mode, "out": out, "tau": tau,
        "n_vectors": stats["n"], "n_pruned": stats["p"],
        "n_survivors": stats["n"] - stats["p"],
    }
    if mode == "survivors":
        keep = back.filter(~F.col("is_pruned")).select(
            F.col("id").alias("vec_id")
        )
        emb.join(keep, "vec_id", "left_semi").write.mode("overwrite").parquet(
            f"{out}/survivors"
        )
    return result


def main() -> None:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["mark", "survivors", "incremental"])
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--tau", type=float, default=0.95)
    ap.add_argument("--n-cells", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch-mod", type=int, default=10)
    ap.add_argument("--ivf-path", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name=f"kickhouse-semdedup-{args.mode}")
    print(
        json.dumps(
            run(
                spark, args.sf_dir, args.out, args.mode, args.tau,
                args.n_cells, args.iters, args.batch_mod, args.ivf_path,
            )
        )
    )


if __name__ == "__main__":
    main()
