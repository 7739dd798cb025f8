#!/usr/bin/env python
"""Job: ANN index health report — the rebuild-decision input.

    python jobs/index_health.py --path /lake/ivf_index [--table vectors]
    python jobs/index_health.py --path /lake/ivfpq_index --table codes \
        [--probe-batch /lake/new_embeddings.parquet --vec-col embedding \
         --id-col vec_id]

Prints one JSON line: cell-balance stats from the cell-partitioned
layout (``operators/ivf.ivf_cell_stats`` — reads only the partition
column) plus, when ``--probe-batch`` points at a parquet of incoming
vectors and the index carries codebooks, that batch's PQ reconstruction
error under the frozen codebooks (``operators/pq.pq_reconstruction_error``
— one Arrow pass over the batch). ``rebuild_hint`` is the headline
field; the raw numbers are the contract so orchestration can apply its
own thresholds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
        ivf_cell_stats,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True, help="index directory")
    ap.add_argument(
        "--table", default="vectors",
        help="cell-partitioned table under the index dir: 'vectors' "
        "(IVF) or 'codes' (IVF-PQ)",
    )
    ap.add_argument(
        "--probe-batch",
        help="parquet of incoming vectors to score for PQ codebook drift "
        "(requires {path}/codebooks)",
    )
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--id-col", default="vec_id")
    args = ap.parse_args()

    spark = get_spark(app_name="kickhouse-index-health")
    report = {"path": args.path, **ivf_cell_stats(spark, args.path, args.table)}

    if args.probe_batch:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
            load_pq_index,
            pq_reconstruction_error,
        )

        _codes, books = load_pq_index(spark, args.path)
        err = pq_reconstruction_error(
            spark.read.parquet(args.probe_batch), books,
            vec_col=args.vec_col, id_col=args.id_col,
        )
        report["pq_probe"] = err

    print(json.dumps(report))


if __name__ == "__main__":
    main()
