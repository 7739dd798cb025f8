#!/usr/bin/env python
"""Job: dedup index lifecycle — build once at ingest, classify forever.

    python jobs/dedup_index.py build --path /tmp/dedup [--sf-dir DIR] \
        [--n 3] [--max-shingle-freq 1000]
    python jobs/dedup_index.py classify --path /tmp/dedup [--sf-dir DIR] \
        [--threshold 0.5] [--batch-mod 20]

The steady state of a production corpus (the batch twin of the streaming
validator's dedup stage): ``build`` materializes the corpus fingerprint
set + guard-filtered inverted shingle index (operators/dedup.py:
build_dedup_index); ``classify`` scores an arriving batch against the
index without ever re-scanning corpus text — exact-dup flag + near-dup
count + best Jaccard per batch doc. ``--batch-mod`` selects the demo
batch (doc_id % mod == 0) from the fixture documents table.

Prints one JSON line per invocation (same contract as the other jobs/
entrypoints).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup_indexed,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "classify", "clusters"])
    ap.add_argument("--path", required=True)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--max-shingle-freq", type=int, default=1000)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--batch-mod", type=int, default=20)
    ap.add_argument(
        "--edges-threshold",
        type=float,
        default=None,
        help="also materialize within-corpus near-dup pairs at this "
        "jaccard cutoff (enables the 'clusters' mode)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name=f"dedup-index-{args.mode}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")

    if args.mode == "build":
        stats = build_dedup_index(
            docs, args.path, "text", "doc_id",
            n=args.n, max_shingle_freq=args.max_shingle_freq,
            edge_threshold=args.edges_threshold,
        )
        print(json.dumps({"mode": "build", "path": args.path, **stats}))
        return

    if args.mode == "clusters":
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.cc import (
            cluster_sizes,
        )
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
            dup_clusters_indexed,
        )

        comps = dup_clusters_indexed(spark, args.path)
        sizes = cluster_sizes(comps)
        agg = sizes.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum((F.col("cluster_size") > 1).cast("int")).alias("multi_doc_clusters"),
            F.max("cluster_size").alias("max_cluster"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "mode": "clusters",
                    "path": args.path,
                    "n_clusters": int(agg["n_clusters"]),
                    "multi_doc_clusters": int(agg["multi_doc_clusters"] or 0),
                    # max over zero rows is NULL — an empty corpus reports 0
                    "max_cluster": int(agg["max_cluster"] or 0),
                }
            )
        )
        return

    batch = docs.filter(F.col("doc_id") % args.batch_mod == 0)
    out = incremental_dedup_indexed(
        spark, args.path, batch, "text", "doc_id", threshold=args.threshold
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("batch_docs"),
        F.sum(F.col("is_exact_dup").cast("int")).alias("exact_dups"),
        F.sum((F.col("n_near_matches") > 0).cast("int")).alias("near_dup_docs"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "mode": "classify",
                "path": args.path,
                "batch_docs": int(agg["batch_docs"]),
                "exact_dups": int(agg["exact_dups"] or 0),
                "near_dup_docs": int(agg["near_dup_docs"] or 0),
            }
        )
    )


if __name__ == "__main__":
    main()
