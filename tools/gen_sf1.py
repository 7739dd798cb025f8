#!/usr/bin/env python
"""Generate an sf1-scale bench fixture from the driver's sf0.1 fixtures.

The driver ships read-only fixtures up to sf0.1 (~600k lineitem rows,
one row group per table — see tools/probe_rowgroups.py / BASELINE.md).
For the scaling ladder we need a 10x fixture whose per-operator cost
model matches sf0.1, so this script up-samples sf0.1 by COPIES=10
**disjoint universes**:

- every scaling table gets 10 key-shifted copies (pk/fk += copy *
  stride, stride = max_key+1), so all intra-copy join relationships are
  exactly those of sf0.1 and copies never join each other;
- `region`/`nation` stay fixed (TPC-H dims don't scale with SF) and all
  nationkey FKs are untouched, so dim joins fan out 10x like real SF
  growth;
- `documents.text` is token-salted per copy (`tok` -> `tok_c3`): every
  shingle/gram/minhash of copy c differs from every other copy's, so
  exact-dup and near-dup cluster structure is 10 disjoint replicas of
  sf0.1's clusters — pair/cluster outputs scale exactly linearly, which
  is the property the ladder measures (un-salted copies would merge
  clusters across universes and make pair counts quadratic in COPIES).
  Copy 0 keeps the original bytes. Trade-off (documented in
  BASELINE.md): salted tokens shift langid/stopword/quality *ratios*
  for copies > 0; per-doc scoring cost — what the bench times — is
  unchanged;
- `embeddings.embedding` gets a per-copy signed dimension permutation
  (an orthogonal transform): within-copy inner products are bit-for-bit
  preserved, cross-copy cosines scramble toward 0, so ANN/semdedup
  neighborhood structure is 10 disjoint replicas of sf0.1's. Copy 0 is
  identity;
- timestamps/dates are left alone (TPC-H date ranges don't scale with
  SF; event/order density per day rises 10x, as at a real SF bump).

Each table is written as MULTI-FILE parquet (`table.parquet/` dir) so
the sf0.1 single-row-group scan-parallelism floor (BASELINE.md) does
not contaminate the ladder.

Skew mode (r10 verdict #1): the uniform fixture never exercises the
data-dependent plan gates — ``--hot-user-share`` reassigns ~that share
of ALL events to one user (routes ``events_window_funnel`` to the scan
plan and stresses every per-user window/collect_list), ``--hot-cust-share``
reassigns ~that share of orders to one customer (skews the orders⋈customer
and orders⋈lineitem-side aggregations), and ``--hot-shingle-frac``
appends one fixed 8-token phrase to ~that fraction of documents (gives
the n-gram inverted index a stopword-grade posting list, the
``max_shingle_freq`` guard's reason to exist). All selections are
md5-bucket deterministic (the engine-portable random contract), hot ids
are EXISTING copy-0 keys so FK joins still resolve, and both engines in
an oracle sweep read the same skewed bytes — any divergence is a real
plan-gate bug, not fixture noise.

Usage:
    python tools/gen_sf1.py [--src DIR] [--dst DIR] [--copies N]
        [--hot-user-share X] [--hot-cust-share X] [--hot-shingle-frac X]

Defaults: src=/root/testdata/sf0.1, dst=<repo>/.benchdata/sf1
(gitignored), copies=10, no skew. Deterministic: per-copy permutations
seed from the copy index; no wall-clock anywhere.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)

# (table, [pk/fk columns to shift by their own table's stride], out files)
SHIFTS: dict[str, tuple[dict[str, str], int]] = {
    # col -> table whose stride it shifts by
    "customer": ({"c_custkey": "customer"}, 8),
    "supplier": ({"s_suppkey": "supplier"}, 4),
    "part": ({"p_partkey": "part"}, 8),
    "orders": ({"o_orderkey": "orders", "o_custkey": "customer"}, 16),
    "lineitem": (
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
        32,
    ),
    "events": ({"event_id": "events", "user_id": "events_user"}, 16),
    "documents": ({"doc_id": "documents"}, 8),
    "embeddings": ({"vec_id": "embeddings"}, 8),
}
FIXED = ("region", "nation")


def _strides(spark: SparkSession, src: str) -> dict[str, int]:
    """stride = max(pk)+1 per keyed table (keys are dense 0..N-1)."""
    out = {}
    pk = {
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    for t, col in pk.items():
        out[t] = load_table(spark, src, t).agg(F.max(col)).collect()[0][0] + 1
    ev = load_table(spark, src, "events").agg(
        F.max("event_id"), F.max("user_id")
    ).collect()[0]
    out["events"] = ev[0] + 1
    out["events_user"] = ev[1] + 1
    return out


def _signed_perm(dim: int, copy: int) -> list[tuple[int, int]]:
    """Deterministic per-copy signed dimension permutation (orthogonal)."""
    rng = random.Random(1000 + copy)
    perm = list(range(dim))
    rng.shuffle(perm)
    return [(p, rng.choice((1, -1))) for p in perm]


def _copy_df(
    spark: SparkSession,
    src: str,
    table: str,
    copy: int,
    strides: dict[str, int],
    emb_dim: int,
) -> DataFrame:
    df = load_table(spark, src, table)
    shifts, _ = SHIFTS[table]
    for col, by in shifts.items():
        df = df.withColumn(col, (F.col(col) + F.lit(copy * strides[by])).cast("bigint"))
    if table == "events":
        df = df.withColumn("user_id", F.col("user_id").cast("bigint"))
    if table == "documents" and copy > 0:
        df = df.withColumn(
            "text",
            F.concat_ws(
                " ", F.expr(f"transform(split(text, ' '), t -> concat(t, '_c{copy}'))")
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings" and copy > 0:
        perm = _signed_perm(emb_dim, copy)
        df = df.withColumn(
            "embedding",
            F.array(
                *[
                    (F.element_at("embedding", src_i + 1) * F.lit(float(sign)))
                    for src_i, sign in perm
                ]
            ).cast("array<float>"),
        )
    return df


#: Planted hot phrase: 8 fresh tokens = 6 hot 3-gram shingles per doc —
#: long enough to matter to posting lists, short enough not to dominate
#: per-doc token counts (the text-analysis queries keep realistic ratios).
HOT_PHRASE = " " + " ".join(f"zqhot{i}" for i in range(8))


def _md5_bucket(col) -> "F.Column":
    """Deterministic uniform 0..999 bucket (engine-portable md5 contract)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % 1000
    )


def _apply_skew(table: str, df: DataFrame, args) -> DataFrame:
    """Post-union skew injection; identity when all shares are 0."""
    if table == "events" and args.hot_user_share > 0:
        # hot id = copy-0's user 0 (exists in every fixture)
        df = df.withColumn(
            "user_id",
            F.when(
                _md5_bucket(F.col("event_id")) < int(args.hot_user_share * 1000),
                F.lit(0).cast("bigint"),
            ).otherwise(F.col("user_id")),
        )
    if table == "orders" and args.hot_cust_share > 0:
        df = df.withColumn(
            "o_custkey",
            F.when(
                _md5_bucket(F.col("o_orderkey")) < int(args.hot_cust_share * 1000),
                F.lit(0).cast("bigint"),
            ).otherwise(F.col("o_custkey")),
        )
    if table == "documents" and args.hot_shingle_frac > 0:
        df = df.withColumn(
            "text",
            F.when(
                _md5_bucket(F.col("doc_id")) < int(args.hot_shingle_frac * 1000),
                F.concat(F.col("text"), F.lit(HOT_PHRASE)),
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(REPO, ".benchdata", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--hot-user-share", type=float, default=0.0)
    ap.add_argument("--hot-cust-share", type=float, default=0.0)
    ap.add_argument("--hot-shingle-frac", type=float, default=0.0)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory", os.environ.get("GEN_DRIVER_MEM", "12g")
        )
        .appName("gen-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    strides = _strides(spark, args.src)
    emb_dim = len(
        load_table(spark, args.src, "embeddings").select("embedding").first()[0]
    )

    for t in FIXED:
        load_table(spark, args.src, t).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{t}.parquet")
        )
        print(f"{t}: copied (fixed dim)")

    # A single N-way union + one global repartition OOMs the heap at
    # copies=1000 (sf100): the plan alone is thousands of scan legs and
    # the shuffle holds the whole table. Non-skewed large runs write in
    # CHUNKS of copies appended to the same parquet directory — each
    # chunk is an independent bounded job, and the file count scales
    # with the data (n_files per 10 copies, the sf1 calibration).
    # Skewed runs keep the single-shot path: skew reassignment is a
    # whole-table transform by construction.
    chunk = int(os.environ.get("GEN_COPY_CHUNK", "50"))
    skewed = bool(
        args.hot_user_share or args.hot_cust_share or args.hot_shingle_frac
    )
    for t, (_, n_files) in SHIFTS.items():
        dstp = os.path.join(args.dst, f"{t}.parquet")
        if skewed or args.copies <= chunk:
            parts = [
                _copy_df(spark, args.src, t, c, strides, emb_dim)
                for c in range(args.copies)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out = _apply_skew(t, out, args)
            out.repartition(n_files).write.mode("overwrite").parquet(dstp)
        else:
            for s in range(0, args.copies, chunk):
                hi = min(s + chunk, args.copies)
                parts = [
                    _copy_df(spark, args.src, t, c, strides, emb_dim)
                    for c in range(s, hi)
                ]
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
                files = max(1, round(n_files * (hi - s) / 10))
                out.repartition(files).write.mode(
                    "overwrite" if s == 0 else "append"
                ).parquet(dstp)
                print(f"{t}: copies {s}..{hi - 1} written", flush=True)
        n = spark.read.parquet(dstp).count()
        print(f"{t}: {n} rows", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
