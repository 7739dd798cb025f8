#!/usr/bin/env python
"""Job: ANN index lifecycle — build once at ingest, query many times.

    python jobs/ann_index.py build --path /tmp/ivf [--sf-dir DIR] \
        [--layout ivf|ivfpq] [--n-cells 16] [--iters 5] [--m 8] [--ks 16]
    python jobs/ann_index.py query --path /tmp/ivf [--layout ivf|ivfpq] \
        [--k 5] [--nprobe 2] [--rerank 50] [--query-ids 0 1 2]

The batch twin of a vector-search service: ``build`` fits the spherical
k-means quantizer and writes the cell-partitioned vector layout +
centroid table (operators/ivf.py); ``query`` loads the index and answers
top-k with only nprobe/n_cells of the data read (cell-directory pruning).
``--layout ivfpq`` builds/queries the compressed layout instead
(operators/pq.py): cell-partitioned m-byte PQ codes + both quantizers,
ADC scan + exact re-rank at query time — nprobe/n_cells of the files at
1/(4·dim/m) the bytes each.
Prints one JSON line per invocation for orchestration (the same contract
as the other jobs/ entrypoints).
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
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk_from_index,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "query", "append"])
    ap.add_argument("--path", required=True)
    ap.add_argument("--layout", choices=["ivf", "ivfpq"], default="ivf")
    ap.add_argument(
        "--batch",
        help="append mode: parquet of arriving vectors (vec_id, "
        "embedding); assigned/encoded under the index's FROZEN "
        "quantizers, replay-guarded",
    )
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--n-cells", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ks", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--rerank", type=int, default=50)
    ap.add_argument("--query-ids", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    args = ap.parse_args()
    if args.mode == "append" and not args.batch:
        ap.error("append mode requires --batch")

    spark = get_spark(app_name=f"kickhouse-ann-{args.mode}")
    emb = load_table(spark, args.sf_dir, "embeddings")

    if args.mode == "append":
        batch = spark.read.parquet(args.batch)
        if args.layout == "ivfpq":
            from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
                append_to_ivfpq_index,
            )

            stats = append_to_ivfpq_index(spark, args.path, batch)
        else:
            from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
                append_to_ivf_index,
            )

            stats = append_to_ivf_index(spark, args.path, batch)
        print(json.dumps({"appended": args.path, "layout": args.layout, **stats}))
    elif args.mode == "build" and args.layout == "ivfpq":
        centroids, books = build_ivfpq_index(
            emb, args.path, n_cells=args.n_cells, cell_iters=args.iters,
            m=args.m, ks=args.ks,
        )
        n = spark.read.parquet(f"{args.path}/codes").count()
        print(
            json.dumps(
                {
                    "built": args.path, "layout": "ivfpq",
                    "n_cells": len(centroids),
                    "code_bytes": int(books.shape[0]), "n_vectors": n,
                }
            )
        )
    elif args.mode == "build":
        centroids = build_ivf_index(
            emb, args.path, n_cells=args.n_cells, iters=args.iters
        )
        n = spark.read.parquet(f"{args.path}/vectors").count()
        print(
            json.dumps(
                {"built": args.path, "n_cells": len(centroids), "n_vectors": n}
            )
        )
    else:
        queries = emb.filter(F.col("vec_id").isin(args.query_ids))
        if args.layout == "ivfpq":
            codes, centroids, books = load_ivfpq_index(spark, args.path)
            out = ivfpq_topk(
                emb, queries, centroids, books, k=args.k,
                nprobe=args.nprobe, rerank=args.rerank, codes=codes,
            )
        else:
            out = ivf_topk_from_index(
                spark, args.path, queries, k=args.k, nprobe=args.nprobe
            )
        rows = [
            {"q_id": r["q_id"], "n_id": r["n_id"], "cos": round(r["cos"], 4), "rank": r["rank"]}
            for r in out.collect()
        ]
        print(json.dumps({"results": rows, "k": args.k, "nprobe": args.nprobe}))


if __name__ == "__main__":
    main()
