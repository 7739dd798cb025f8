#!/usr/bin/env python
"""Job: takedown / right-to-be-forgotten sweep across the persisted
indexes (operators/forget.py).

Against a full-pipeline state root:

    python jobs/forget.py --state /lake/pipeline \\
        --docs /lake/takedown/docs.parquet \\
        --vec-ids /lake/takedown/vec_ids.parquet [--vacuum]

or against individual indexes:

    python jobs/forget.py --bm25 /lake/bm25_index --docs .../docs.parquet
    python jobs/forget.py --ivf /lake/ivf_index --vec-ids .../ids.parquet

``--docs`` must carry (doc_id, text) — the text is what lets the BM25
delete prune to the doc's term buckets and the dedup tombstone carry the
content fingerprint. ``--vacuum`` additionally pays the dedup index's
physical rewrite (maintenance-window op); without it the tombstones
take effect at the absorb gate immediately and vacuum can run later.
Prints one JSON stats line. Sketches cannot forget (additive-only) —
rebuild them from the surviving corpus if that matters.
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
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.forget import (
        forget_from_bm25_index,
        forget_from_dedup_index,
        forget_from_ivf_index,
        forget_from_ivfpq_index,
        forget_from_pipeline,
        forget_from_survivors,
        vacuum_dedup_index,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.pipeline import (
        PipelinePaths,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--state", help="full-pipeline state root (PipelinePaths)")
    ap.add_argument("--dedup", help="dedup index path")
    ap.add_argument("--bm25", help="BM25 index path")
    ap.add_argument("--survivors", help="semdedup survivors path")
    ap.add_argument("--ivf", help="IVF index path")
    ap.add_argument("--ivfpq", help="IVF-PQ index path")
    ap.add_argument(
        "--phash", help="perceptual-hash gate index path (takes --vec-ids "
        "or --docs ids — only the id column is read)",
    )
    ap.add_argument("--docs", help="parquet with (doc_id, text) to forget")
    ap.add_argument("--vec-ids", help="parquet with vec_id rows to forget")
    ap.add_argument(
        "--vacuum", action="store_true",
        help="also physically vacuum the dedup index (maintenance window)",
    )
    args = ap.parse_args()
    doc_targets = args.state or args.dedup or args.bm25 or args.phash
    vec_targets = (
        args.state or args.survivors or args.ivf or args.ivfpq or args.phash
    )
    if args.docs and not doc_targets:
        ap.error("--docs needs --state, --dedup, --bm25, or --phash")
    if args.vec_ids and not vec_targets:
        ap.error(
            "--vec-ids needs --state, --survivors, --ivf, --ivfpq, or --phash"
        )
    if not args.docs and not args.vec_ids:
        ap.error("nothing to forget: pass --docs and/or --vec-ids")

    spark = get_spark(app_name="kickhouse-forget")
    docs = spark.read.parquet(args.docs) if args.docs else None
    vec_ids = spark.read.parquet(args.vec_ids) if args.vec_ids else None

    out: dict = {}
    if args.state:
        out = forget_from_pipeline(
            spark, PipelinePaths(args.state), docs=docs, vec_ids=vec_ids
        )
        if args.vacuum and docs is not None:
            out["vacuum"] = vacuum_dedup_index(
                spark, PipelinePaths(args.state).dedup_index
            )
    else:
        if docs is not None and args.dedup:
            out["dedup"] = forget_from_dedup_index(spark, args.dedup, docs)
            if args.vacuum:
                out["vacuum"] = vacuum_dedup_index(spark, args.dedup)
        if docs is not None and args.bm25:
            out["bm25"] = forget_from_bm25_index(spark, args.bm25, docs)
        if vec_ids is not None and args.survivors:
            out["survivors"] = forget_from_survivors(spark, args.survivors, vec_ids)
        if vec_ids is not None and args.ivf:
            out["ivf"] = forget_from_ivf_index(spark, args.ivf, vec_ids)
        if vec_ids is not None and args.ivfpq:
            out["ivfpq"] = forget_from_ivfpq_index(spark, args.ivfpq, vec_ids)
        if args.phash:
            from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.phash_index import (
                forget_from_phash_index,
            )

            src = vec_ids if vec_ids is not None else docs
            id_col = "vec_id" if vec_ids is not None else "doc_id"
            out["phash"] = forget_from_phash_index(
                spark, args.phash, src, id_col=id_col
            )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
