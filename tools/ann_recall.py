#!/usr/bin/env python
"""ANN recall@k gauge at fixture scale (r10 verdict #6).

The IVF/PQ/IVF-PQ shortlists carry *equality* companions at full probe
depth (nprobe = n_cells, rerank >= N — provably brute force), but no
recorded recall at PRODUCTION probe depth, where cells are pruned and
shortlists are bounded. This tool measures it directly:

- exact truth: similarity.brute_force_topk over a deterministic
  md5-ordered sample of query vectors (the engine-portable random
  contract — no rand());
- each index is built with the SAME corpus-proportional geometry the
  bench uses (constant rows/cell: n_cells = n/31, ivfpq n/125, PQ m=16
  ks=64), then queried across a probe ladder bracketing the catalog
  defaults (IVF nprobe=2, PQ rerank=50, IVF-PQ nprobe=4/rerank=50);
- recall@k = mean over queries of |ANN top-k ∩ exact top-k| / k.

Writes sweeps/ann_recall_<tag>.json and prints one summary JSON line.

Usage:
    python tools/ann_recall.py --sf-dir .benchdata/sf1 --tag r11_sf1
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _recall(truth: dict[int, set], result_rows, k: int) -> float:
    got: dict[int, set] = {}
    for r in result_rows:
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    return round(
        sum(len(got.get(q, set()) & t) / k for q, t in truth.items()) / len(truth),
        4,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".benchdata", "sf1"))
    ap.add_argument("--tag", default="sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk_from_index,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        build_ivfpq_index,
        build_pq_index,
        ivfpq_topk,
        load_ivfpq_index,
        load_pq_index,
        pq_search_rerank,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.similarity import (
        brute_force_topk,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("kickhouse-ann-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.sf_dir, "embeddings")
    n = emb.count()
    k = args.k
    # deterministic query sample: md5 total order, first n_queries
    queries = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(args.n_queries)
        .persist()
    )
    queries.count()

    t0 = time.perf_counter()
    truth_rows = brute_force_topk(emb, queries, k=k).collect()
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r["q_id"], set()).add(r["n_id"])
    secs_truth = round(time.perf_counter() - t0, 3)

    # bench geometry: constant rows/cell so the gauge tracks a production
    # deployment at any corpus size (bench.py sizes identically)
    ivf_cells = max(16, round(n / 31))
    ivfpq_cells = max(4, round(n / 125))

    out: dict = {
        "sf_dir": args.sf_dir, "n_vectors": n, "k": k,
        "n_queries": args.n_queries, "secs_bruteforce": secs_truth,
        "geometry": {"ivf_cells": ivf_cells, "ivfpq_cells": ivfpq_cells,
                     "pq_m": 16, "pq_ks": 64},
        "ivf": {}, "pq": {}, "ivfpq": {},
    }

    root = tempfile.mkdtemp(prefix="kickhouse-ann-recall-")
    try:
        build_ivf_index(emb, f"{root}/ivf", n_cells=ivf_cells, iters=2)
        for nprobe in (1, 2, 4, 8, 16, 32):
            if nprobe > ivf_cells:
                break
            t0 = time.perf_counter()
            rows = ivf_topk_from_index(
                spark, f"{root}/ivf", queries, k=k, nprobe=nprobe
            ).collect()
            out["ivf"][f"nprobe={nprobe}"] = {
                "recall": _recall(truth, rows, k),
                "secs": round(time.perf_counter() - t0, 3),
            }

        build_pq_index(emb, f"{root}/pq", m=16, ks=64, iters=4)
        codes, books = load_pq_index(spark, f"{root}/pq")
        for rerank in (50, 100, 200, 400):
            t0 = time.perf_counter()
            rows = pq_search_rerank(
                emb, queries, books, k=k, rerank=rerank, codes=codes
            ).collect()
            out["pq"][f"rerank={rerank}"] = {
                "recall": _recall(truth, rows, k),
                "secs": round(time.perf_counter() - t0, 3),
            }

        build_ivfpq_index(
            emb, f"{root}/ivfpq", n_cells=ivfpq_cells, cell_iters=2,
            m=16, ks=64, pq_iters=4,
        )
        pq_codes, cents, pq_books = load_ivfpq_index(spark, f"{root}/ivfpq")
        for nprobe, rerank in (
            (2, 50),
            (4, 50),
            (4, 100),
            (8, 200),
            (8, 400),
            (16, 400),
        ):
            if nprobe > ivfpq_cells:
                continue
            t0 = time.perf_counter()
            rows = ivfpq_topk(
                emb, queries, cents, pq_books, k=k, nprobe=nprobe,
                rerank=rerank, codes=pq_codes,
            ).collect()
            out["ivfpq"][f"nprobe={nprobe},rerank={rerank}"] = {
                "recall": _recall(truth, rows, k),
                "secs": round(time.perf_counter() - t0, 3),
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        queries.unpersist()

    path = os.path.join(REPO, "sweeps", f"ann_recall_{args.tag}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
