#!/usr/bin/env python
"""Measure what the skew gates actually buy (r9 verdict #5).

The engine carries two data-dependent plan gates that until now were
correctness-tested but never perf-proven:

- ``should_salt`` (count-min top-key share bound) routes
  ``events_window_funnel`` from the pair-materializing join plan to the
  per-user sorted-scan plan when one user owns too many events;
- ``max_shingle_freq`` (hot-shingle guard) drops stopword-grade shingles
  from the n-gram Jaccard inverted index before the posting-list
  self-join goes quadratic in the hottest list.

This tool PLANTS the skew each gate exists for — one user reassigned
~10% of all events; one 3-gram phrase injected into a configurable
fraction of documents — then times each operator with the gate's pick
vs the gate forced off, on the same session, medians of ``--repeats``.
Funnel results are asserted identical both ways (the gate is a plan
choice, not a semantics choice); Jaccard pair counts are reported for
both (the guard legitimately redefines the shingle universe, so counts
may differ — exactness-over-filtered-universe is its documented
contract).

Prints one JSON line; archive to benchruns/ and summarize in
BASELINE.md.

Usage:
    python tools/skew_probe.py [--sf-dir /root/testdata/sf0.1]
        [--repeats 3] [--hot-shares 0.1,0.3,0.5] [--doc-frac 0.5] [--phrase-words 3,22]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--hot-shares", default="0.1,0.3,0.5",
                    help="comma list: share of ALL events moved to the hot user")
    ap.add_argument("--doc-frac", type=float, default=0.5)
    ap.add_argument("--phrase-words", default="3,22",
                    help="comma list: planted hot-phrase lengths (3-gram counts = w-2)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.dedup import (
        clear_all_caches,
        ngram_jaccard_pairs,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
        estimated_top_share,
        should_salt,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans.dq_suite import (
        _funnel_by_join,
        _funnel_by_scan,
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
        .appName("kickhouse-skew-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": args.sf_dir, "repeats": args.repeats}

    # ---- probe A: hot user vs events_window_funnel ----------------------
    # measured as a CURVE over hot-user share: the gate exists for the
    # cliff, so show where the cliff is, not one point on the flat part
    ev = load_table(spark, args.sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("double").alias("e")
    )
    hot_id = -777
    out["funnel"] = {
        "events": ev.count(),
        "gate_base": bool(should_salt(ev, ["user_id"], share_threshold=0.05)),
        "shares": {},
    }

    def split(e):
        return (
            e.filter(F.col("event_type") == "view").select("user_id", F.col("e").alias("v")),
            e.filter(F.col("event_type") == "signup").select("user_id", F.col("e").alias("s")),
            e.filter(F.col("event_type") == "purchase").select("user_id", F.col("e").alias("p")),
        )

    def measure(frame):
        v, s, p = split(frame)
        res = {}
        for plan, fn in (("join", _funnel_by_join), ("scan", _funnel_by_scan)):
            samples = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                fn(v, s, p).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            res[plan] = round(_median(samples), 3)
        # semantics: both plans must agree exactly
        a = sorted(map(tuple, _funnel_by_join(v, s, p).collect()))
        b = sorted(map(tuple, _funnel_by_scan(v, s, p).collect()))
        res["results_equal"] = a == b
        res["users"] = len(a)
        return res

    out["funnel"]["base"] = measure(ev)
    # deterministic ~share of rows move to the hot user (md5-bucket
    # selection — the engine-portable random contract)
    bucket = F.conv(F.substring(F.md5(F.col("e").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 1000
    for share in [float(x) for x in args.hot_shares.split(",") if x]:
        skewed = ev.withColumn(
            "user_id",
            F.when(bucket < int(share * 1000), F.lit(hot_id)).otherwise(
                F.col("user_id")
            ),
        ).persist()
        rec = measure(skewed)
        rec["hot_user_events"] = skewed.filter(F.col("user_id") == hot_id).count()
        rec["gate"] = bool(should_salt(skewed, ["user_id"], share_threshold=0.05))
        rec["top_share_bound"] = round(estimated_top_share(skewed, ["user_id"]), 4)
        out["funnel"]["shares"][str(share)] = rec
        skewed.unpersist()

    # ---- probe B: hot shingle vs n-gram Jaccard guard --------------------
    docs = load_table(spark, args.sf_dir, "documents")
    out["jaccard"] = {}
    for words in [int(x) for x in args.phrase_words.split(",") if x]:
        # a planted phrase of W unseen tokens = W-2 hot 3-gram shingles,
        # each with a posting list of ~doc_frac x |docs| documents — the
        # stopword-run shape the guard exists for
        hot_phrase = " " + " ".join(f"zq{i}" for i in range(words))
        planted = docs.withColumn(
            "text",
            F.when(
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                .cast("long") % 1000
                < int(args.doc_frac * 1000),
                F.concat(F.col("text"), F.lit(hot_phrase)),
            ).otherwise(F.col("text")),
        ).persist()
        n_docs = planted.count()
        n_hot = planted.filter(F.col("text").endswith(hot_phrase)).count()
        jac = {"docs": n_docs, "hot_docs": n_hot, "hot_shingles": max(words - 2, 1)}
        for tag, freq in (("guard_on", 1000), ("guard_off", None)):
            samples, pairs = [], None
            for _ in range(args.repeats):
                clear_all_caches()
                t0 = time.perf_counter()
                pairs = ngram_jaccard_pairs(
                    planted, "text", "doc_id", n=3, threshold=0.5,
                    max_shingle_freq=freq,
                ).count()
                samples.append(time.perf_counter() - t0)
            jac[tag] = {"secs": round(_median(samples), 3), "pairs": pairs}
        clear_all_caches()
        planted.unpersist()
        out["jaccard"][f"{words}w"] = jac

    print(json.dumps(out))
    ok = (
        not out["funnel"]["gate_base"]
        and all(r["gate"] for r in out["funnel"]["shares"].values())
        and out["funnel"]["base"]["results_equal"]
        and all(r["results_equal"] for r in out["funnel"]["shares"].values())
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
