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
) -> dict:
    """Run the four stages; returns the stage-by-stage row accounting."""
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

    return {
        "input_docs": n_input,
        "after_exact_dedup": n_exact,
        "after_neardup_dedup": n_neardup,
        "n_shards": n_shards,
        "out": out,
    }


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
    args = ap.parse_args()

    spark = get_spark(app_name="kickhouse-curate")
    print(json.dumps(curate(spark, args.sf_dir, args.out, args.threshold, args.target_tokens)))


if __name__ == "__main__":
    main()
