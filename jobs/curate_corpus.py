#!/usr/bin/env python
"""Job: end-to-end training-corpus curation — the LLM-data pipeline this
engine exists for, as one composable run.

    python jobs/curate_corpus.py --out /tmp/corpus_gold \
        [--sf-dir DIR] [--threshold 0.5] [--target-tokens 2000]

Stages (each one an operator this repo tests and oracles independently):

1. **clean** — PII-style redaction (emails, long digit runs, denylist) and
   token counting; narrow map, no shuffle.
2. **exact dedup** — 64-bit fingerprint groupBy, min-id keeper.
3. **near-dup clustering** — n-gram Jaccard pairs (inverted index, hot-
   shingle guard ON) resolved into connected components (large-star/
   small-star); keep each cluster's min-id representative.
4. **shard layout** — token-balanced shard ids via the two-phase parallel
   prefix sum; written `shard_id=N/` partitioned parquet, per-bucket
   sorted with the partition column leading.

Every stage is DataFrame-native: the whole pipeline is one lazy plan up to
the CC loop (which checkpoints), and the final write is the only terminal
action. At 100 TB the same code runs unchanged; only the bucket/shard
constants move.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(
    spark: SparkSession,
    sf_dir: str,
    out: str,
    threshold: float = 0.5,
    target_tokens: int = 2000,
    quality_gate: bool = False,
    span_rewrite: bool = False,
    benchmark: str | None = None,
) -> dict:
    """Run the stages; returns the stage-by-stage row accounting.

    Optional stages (off by default, preserving the four-stage contract):
    ``quality_gate`` drops classifier-rejected docs after cleaning
    (operators/quality.py, exact integer sign test); ``span_rewrite``
    excises corpus-duplicated 8-token runs from the near-dup survivors
    (operators/dedup.remove_duplicate_spans) and recounts tokens before
    sharding — the Lee-et-al removal step, so shard budgets see the
    post-dedup token mass; ``benchmark`` (a parquet path with the same
    text/id columns) decontaminates the survivors by excising every
    5-token run that also occurs in the benchmark table
    (operators/dedup.remove_overlap_spans) — applied after span_rewrite
    when both are on, before tokens are recounted."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.text import (
        token_count,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.cc import (
        connected_components,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        token_balanced_shards,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans.llm_text import (
        _REDACT_DENYLIST,
        _REDACT_DIGITS,
        _REDACT_EMAIL,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 1. clean
    cleaned_text = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _REDACT_EMAIL, "[EMAIL]"),
            _REDACT_DIGITS,
            "[NUM]",
        ),
        _REDACT_DENYLIST,
        "[TERM]",
    )
    cleaned = docs.select(
        "doc_id",
        "lang",
        "source",
        cleaned_text.alias("text"),
    ).withColumn("n_tok", token_count("text"))

    # 1b. optional model-based quality gate (exact integer sign test)
    n_quality = None
    if quality_gate:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.quality import (
            quality_filter,
        )

        cleaned = quality_filter(cleaned, "text", "doc_id")
        n_quality = cleaned.count()

    # 2. exact dedup (keeps lowest doc_id per identical normalized text)
    deduped = exact_dedup(cleaned, "text", "doc_id")
    n_exact = deduped.count()

    # 3. near-dup clustering -> keep cluster representative (min doc_id)
    pairs = ngram_jaccard_pairs(deduped, "text", "doc_id", n=3, threshold=threshold)
    comps = connected_components(
        pairs, src="a_id", dst="b_id", nodes=deduped.select(F.col("doc_id").alias("id"))
    )
    survivors: DataFrame = deduped.join(
        comps.filter(F.col("id") == F.col("component")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )
    n_neardup = survivors.count()

    # 3b. optional exact-substring span removal over the survivors
    removed_tokens = None
    if span_rewrite:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        rewritten = remove_duplicate_spans(survivors, "text", "doc_id", l=8)
        removed_tokens = (
            rewritten.agg(F.sum("removed_tokens")).collect()[0][0] or 0
        )
        survivors = (
            survivors.drop("text", "n_tok")
            .join(
                rewritten.select(
                    "doc_id", F.col("cleaned_text").alias("text")
                ),
                "doc_id",
            )
            .withColumn("n_tok", token_count("text"))
        )

    # 3c. optional benchmark decontamination over the survivors
    decontam_tokens = None
    if benchmark is not None:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
            remove_overlap_spans,
        )

        bench_df = spark.read.parquet(benchmark)
        rewritten = remove_overlap_spans(survivors, bench_df, "text", "doc_id", l=5)
        decontam_tokens = (
            rewritten.agg(F.sum("removed_tokens")).collect()[0][0] or 0
        )
        survivors = (
            survivors.drop("text", "n_tok")
            .join(
                rewritten.select("doc_id", F.col("cleaned_text").alias("text")),
                "doc_id",
            )
            .withColumn("n_tok", token_count("text"))
        )

    # 4. token-balanced shards, partitioned write (sort leads with the
    # partition column — FileFormatWriter drops trailing sort keys otherwise)
    sharded = token_balanced_shards(
        survivors, "n_tok", "doc_id", target_per_shard=target_tokens
    )
    (
        sharded.sortWithinPartitions("shard_id", "doc_id")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(out)
    )
    n_shards = sharded.select("shard_id").distinct().count()

    stats = {
        "input_docs": n_input,
        "after_exact_dedup": n_exact,
        "after_neardup_dedup": n_neardup,
        "n_shards": n_shards,
        "out": out,
    }
    if n_quality is not None:
        stats["after_quality_gate"] = n_quality
    if removed_tokens is not None:
        stats["span_tokens_removed"] = int(removed_tokens)
    if decontam_tokens is not None:
        stats["benchmark_tokens_removed"] = int(decontam_tokens)
    return stats


def main() -> None:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--target-tokens", type=int, default=2000)
    ap.add_argument("--quality-gate", action="store_true")
    ap.add_argument("--span-rewrite", action="store_true")
    ap.add_argument(
        "--benchmark",
        help="parquet path of a benchmark/eval table (text, doc_id); "
        "survivors are decontaminated against it (5-gram span excision)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="kickhouse-curate")
    print(
        json.dumps(
            curate(
                spark, args.sf_dir, args.out, args.threshold, args.target_tokens,
                quality_gate=args.quality_gate, span_rewrite=args.span_rewrite,
                benchmark=args.benchmark,
            )
        )
    )


if __name__ == "__main__":
    main()
