#!/usr/bin/env python
"""Job: streaming ingest gates in front of a training corpus.

Document gate (text dedup — exact + n-gram near-dup against the
persisted index, accepted docs absorbed):

    python jobs/ingest_gate.py docs --source /lake/docs_stream \\
        --index /lake/dedup_index --checkpoint /lake/_ckpt/docs_gate \\
        [--text-col text --id-col doc_id --threshold 0.5]

Embedding gate (semantic dedup — survivors corpus maintained under the
persisted IVF quantizer):

    python jobs/ingest_gate.py embeddings --source /lake/emb_stream \\
        --survivors /lake/sem_survivors --ivf /lake/ivf_index \\
        --checkpoint /lake/_ckpt/emb_gate [--tau 0.95]

Both tail a parquet directory (swap the reader line for Kafka in a real
deployment — the foreachBatch body is source-agnostic), run until
terminated, and print one JSON stats line per micro-batch for
orchestration. ``--drain`` processes everything currently available and
exits — the batch-backfill twin of the same gate (ST12 discipline:
one transform, two drivers). ``--schema`` (a DDL string) lets the gate
start BEFORE its producer has written anything; without it the schema
is inferred from the existing source files.

Perceptual-hash gate (multimodal near-dup — image/audio/video hashes
absorbed against the persisted banded index):

    python jobs/ingest_gate.py phash --source /lake/phash_stream \\
        --index /lake/phash_index --checkpoint /lake/_ckpt/phash_gate \\
        [--id-col doc_id --hash-col hash]

Full pipeline (one batch through EVERY ingest stage — quality gate,
dedup absorb, BM25 append, HLL + count-min maintenance, semdedup, IVF
and IVF-PQ appends — ``streaming/pipeline.py``):

    python jobs/ingest_gate.py pipeline --source /lake/docs_batch \\
        --emb-source /lake/emb_batch --state /lake/pipeline \\
        --batch-id 7 [--crash-after bm25_append]

``--crash-after`` injects a crash at that stage's boundary — the ops
drill for the at-least-once retry discipline: re-run the SAME command
without the flag and every stage skips what it already owns
(``tests/test_pipeline_soak.py`` proves convergence at every boundary).
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
        load_centroids,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.dedup_stream import (
        maintain_dedup_stream,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.semdedup_stream import (
        maintain_semdedup_stream,
    )

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.pipeline import (
        STAGES,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["docs", "embeddings", "pipeline", "phash"])
    ap.add_argument("--source", required=True, help="parquet dir to tail")
    ap.add_argument(
        "--emb-source", help="pipeline mode: embeddings parquet dir"
    )
    ap.add_argument(
        "--state", help="pipeline mode: root dir for all indexes/sketches"
    )
    ap.add_argument("--batch-id", type=int, default=0)
    ap.add_argument(
        "--crash-after", choices=STAGES,
        help="pipeline mode: inject a crash at this stage's boundary "
        "(ops drill for the retry discipline)",
    )
    ap.add_argument("--checkpoint")
    ap.add_argument("--index", help="dedup index path (docs mode)")
    ap.add_argument("--survivors", help="survivors table path (embeddings mode)")
    ap.add_argument("--ivf", help="IVF index path for the coarse quantizer")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--vec-id-col", default="vec_id")
    ap.add_argument("--hash-col", default="hash")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--tau", type=float, default=0.95)
    ap.add_argument("--trigger", default="5 seconds")
    ap.add_argument(
        "--drain", action="store_true",
        help="process everything available, then exit (backfill twin)",
    )
    ap.add_argument(
        "--schema",
        help="DDL schema for the source (required to start before the "
        "producer has written any file; otherwise inferred)",
    )
    ap.add_argument(
        "--quality-gate", action="store_true",
        help="docs mode: drop classifier-rejected docs (exact integer "
        "sign test, operators/quality.py) BEFORE the dedup absorb — the "
        "streaming twin of curate_corpus.py --quality-gate",
    )
    ap.add_argument(
        "--reconcile", action="store_true",
        help="embeddings mode: instead of streaming, rebuild the "
        "survivors table as the order-free batch answer over --source "
        "(the source of record) and atomically swap it in — the "
        "maintenance-window fix for first-seen-wins ordering drift; "
        "exits after the swap",
    )
    args = ap.parse_args()
    # validate mode-conditional args BEFORE paying JVM startup
    if args.mode == "pipeline" and not (args.emb_source and args.state):
        ap.error("pipeline mode requires --emb-source and --state")
    if args.mode == "docs" and not args.index:
        ap.error("docs mode requires --index")
    if args.mode == "phash" and not args.index:
        ap.error("phash mode requires --index")
    if args.mode == "embeddings" and not (args.survivors and args.ivf):
        ap.error("embeddings mode requires --survivors and --ivf")
    if args.reconcile and args.mode != "embeddings":
        ap.error("--reconcile applies to embeddings mode only")
    if args.quality_gate and args.mode != "docs":
        ap.error("--quality-gate applies to docs mode only")
    if args.mode != "pipeline" and not args.reconcile and not args.checkpoint:
        ap.error("--checkpoint is required (except with --reconcile)")

    spark = get_spark(app_name=f"kickhouse-ingest-gate-{args.mode}")

    def emit(stats: dict) -> None:
        print(json.dumps(stats), flush=True)

    if args.mode == "pipeline":
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.pipeline import (
            PipelinePaths,
            ingest_pipeline_batch,
        )

        emit(
            ingest_pipeline_batch(
                spark,
                spark.read.parquet(args.source),
                spark.read.parquet(args.emb_source),
                PipelinePaths(args.state),
                args.batch_id,
                threshold=args.threshold,
                tau=args.tau,
                fail_after=args.crash_after,
            )
        )
        return

    if args.reconcile:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.semdedup_stream import (
            reconcile_semdedup_survivors,
        )

        emit(
            reconcile_semdedup_survivors(
                spark,
                spark.read.parquet(args.source),
                args.survivors,
                load_centroids(spark, args.ivf),
                tau=args.tau,
                vec_col=args.vec_col,
                id_col=args.vec_id_col,
            )
        )
        return

    if args.schema:
        schema = args.schema
    else:
        try:
            schema = spark.read.parquet(args.source).schema
        except Exception as exc:
            raise SystemExit(
                f"cannot infer schema from {args.source!r} (empty or "
                f"missing — start the producer first, or pass --schema "
                f"'col1 type1, ...'): {exc}"
            )
    stream = spark.readStream.schema(schema).parquet(args.source)

    if args.mode == "phash":
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.phash_index import (
            maintain_phash_stream,
        )

        q = maintain_phash_stream(
            stream, args.index, args.checkpoint, args.id_col, args.hash_col,
            trigger=args.trigger, on_batch=emit,
        )
    elif args.mode == "docs":
        prepare = None
        if args.quality_gate:
            from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.quality import (
                quality_filter,
            )

            def prepare(batch):
                return quality_filter(batch, args.text_col, args.id_col)

        q = maintain_dedup_stream(
            stream, args.index, args.checkpoint, args.text_col,
            args.id_col, args.threshold, trigger=args.trigger,
            prepare=prepare, on_batch=emit,
        )
    else:
        centroids = load_centroids(spark, args.ivf)
        q = maintain_semdedup_stream(
            stream, args.survivors, args.checkpoint, centroids,
            tau=args.tau, vec_col=args.vec_col, id_col=args.vec_id_col,
            trigger=args.trigger, on_batch=emit,
        )

    if args.drain:
        q.processAllAvailable()
        q.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main()
