"""Token-balanced sharding: prefix-sum correctness vs a sequential scan,
shard-size invariants, and the partitioned writer layout."""

import os

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
    token_balanced_shards,
    write_token_shards,
)

TARGET = 500


def _fixture(spark, n=937, seed=5):
    # deterministic heavy-tailed weights, ids with gaps (ids need not be dense)
    rows = [(i * 3, (i * 7919 + seed) % 97 + (113 if i % 50 == 0 else 1)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long"), rows


def test_matches_sequential_scan(spark):
    df, rows = _fixture(spark)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in token_balanced_shards(df, "n_tok", "doc_id", TARGET, bucket_width=64).collect()
    }
    prefix = 0
    for doc_id, w in sorted(rows):
        assert got[doc_id] == prefix // TARGET, doc_id
        prefix += w


def test_shard_totals_bounded(spark):
    df, rows = _fixture(spark)
    max_w = max(w for _, w in rows)
    totals = (
        token_balanced_shards(df, "n_tok", "doc_id", TARGET, bucket_width=64)
        .groupBy("shard_id")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    )
    # a doc lands in the shard its START falls into -> total < target + max_w
    assert all(r["t"] < TARGET + max_w for r in totals)
    # shards are contiguous: ids 0..max with none skipped
    ids = sorted(r["shard_id"] for r in totals)
    assert ids == list(range(len(ids)))


def test_writer_partition_layout(spark, tmp_path):
    df, _ = _fixture(spark, n=200)
    path = str(tmp_path / "shards")
    write_token_shards(df, path, "n_tok", "doc_id", TARGET)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    assert len(dirs) > 1
    back = spark.read.parquet(path)
    assert back.count() == 200
    # partition pruning: the shard filter appears as a partition filter, and
    # the pruned read returns only shard 0's docs
    one = back.filter(F.col("shard_id") == 0)
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "shard_id" in plan
    seq = sorted(r["doc_id"] for r in one.collect())
    assert seq and seq == sorted(
        r["doc_id"]
        for r in token_balanced_shards(df, "n_tok", "doc_id", TARGET)
        .filter(F.col("shard_id") == 0)
        .collect()
    )


def test_pack_sequences_matches_sequential_packing(spark):
    """Slices must equal what a sequential packer produces: walk docs in
    order, cut at every seq_len boundary."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        pack_sequences,
    )

    L = 128
    df, rows = _fixture(spark)
    got = {
        (r["doc_id"], r["seq_id"]): (r["begin_tok"], r["end_tok"])
        for r in pack_sequences(df, "n_tok", "doc_id", L, bucket_width=64).collect()
    }
    expect = {}
    prefix = 0
    for doc_id, w in sorted(rows):
        for seq in range(prefix // L, (prefix + w - 1) // L + 1):
            b = max(seq * L, prefix) - prefix
            e = min((seq + 1) * L, prefix + w) - prefix
            expect[(doc_id, seq)] = (b, e)
        prefix += w
    assert got == expect


def test_pack_sequences_invariants(spark):
    """(a) per-doc slices concatenate to exactly [0, n_tok); (b) every
    sequence except the last carries exactly seq_len tokens; (c) zero-
    weight docs emit nothing."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        pack_sequences,
    )

    L = 128
    df, rows = _fixture(spark)
    df = df.union(df.sparkSession.createDataFrame([(99999, 0)], df.schema))
    out = pack_sequences(df, "n_tok", "doc_id", L, bucket_width=64).collect()
    assert all(r["doc_id"] != 99999 for r in out)
    per_doc = {}
    per_seq = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append((r["begin_tok"], r["end_tok"]))
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (r["end_tok"] - r["begin_tok"])
    weights = dict(rows)
    for doc_id, slices in per_doc.items():
        slices.sort()
        assert slices[0][0] == 0 and slices[-1][1] == weights[doc_id]
        for (b1, e1), (b2, e2) in zip(slices, slices[1:]):
            assert e1 == b2  # contiguous, non-overlapping
    last = max(per_seq)
    for seq, tok in per_seq.items():
        if seq != last:
            assert tok == L, (seq, tok)


def test_write_packed_sequences_layout(spark, tmp_path):
    """seq_shard partitioned layout: content equals pack_sequences, a
    shard-range read prunes to the matching directories only."""
    import os as _os

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        pack_sequences,
        write_packed_sequences,
    )

    L, PER = 64, 4
    df, _ = _fixture(spark, n=200)
    path = str(tmp_path / "packed")
    write_packed_sequences(df, path, "n_tok", "doc_id", L,
                           seqs_per_shard=PER, bucket_width=64)
    back = spark.read.parquet(path)
    direct = pack_sequences(df, "n_tok", "doc_id", L, bucket_width=64)
    a = sorted(map(tuple, back.select("doc_id", "seq_id", "begin_tok", "end_tok").collect()))
    b = sorted(map(tuple, direct.select("doc_id", "seq_id", "begin_tok", "end_tok").collect()))
    assert a == b
    # directory layout + shard arithmetic
    dirs = sorted(d for d in _os.listdir(path) if d.startswith("seq_shard="))
    max_seq = max(r["seq_id"] for r in direct.collect())
    assert len(dirs) == max_seq // PER + 1
    # partition pruning: a one-shard filter shows PartitionFilters in plan
    q = back.filter(F.col("seq_shard") == 1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "seq_shard" in plan
    got = {r["seq_id"] for r in q.collect()}
    assert got == {s for s in range(PER, 2 * PER) if s <= max_seq}


def test_global_shuffle_is_a_permutation(spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        global_shuffle,
    )
    import hashlib

    df, rows = _fixture(spark, n=500)
    out = global_shuffle(df.select("doc_id"), "doc_id", n_shards=8).collect()
    assert len(out) == 500
    # round-robin deal: shard sizes differ by at most 1, positions dense
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    sizes = {s: len(v) for s, v in by_shard.items()}
    assert set(by_shard) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # rank replays the md5-key order exactly (sequential reference)
    key = lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i)
    expect = {
        doc_id: (rank % 8, rank // 8)
        for rank, (_, doc_id) in enumerate(
            sorted((key(doc_id) for doc_id, _ in rows))
        )
    }
    got = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in out}
    assert got == expect


def test_global_shuffle_repartition_stable(spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        global_shuffle,
    )

    df, _ = _fixture(spark, n=300)
    a = sorted(map(tuple, global_shuffle(df, "doc_id", 4).collect()))
    b = sorted(map(tuple, global_shuffle(df.repartition(13), "doc_id", 4).collect()))
    assert a == b


def test_rendezvous_shard_minimal_movement(spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        rendezvous_shard,
    )

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = df.select(
        "doc_id",
        rendezvous_shard("doc_id", 8).alias("s8"),
        rendezvous_shard("doc_id", 9).alias("s9"),
    ).collect()
    moved = [r for r in out if r["s8"] != r["s9"]]
    # every mover lands on the NEW shard — the rendezvous property
    assert all(r["s9"] == 8 for r in moved)
    # ~1/9 of docs move (binomial n=2000 p=1/9: mean ~222, sd ~14)
    assert 150 <= len(moved) <= 300
    # both assignments cover all shards roughly uniformly
    from collections import Counter

    c8 = Counter(r["s8"] for r in out)
    assert set(c8) == set(range(8))
    assert max(c8.values()) < 2 * min(c8.values())


def test_rendezvous_shard_matches_md5_reference(spark):
    """Exact sequential reference: argmax over md5 scores with
    higher-shard tie-break, replayed in Python per doc."""
    import hashlib

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        rendezvous_shard,
    )

    n = 7
    ids = [0, 1, 5, 99, 1000, 123456789, 2**40 + 3]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", rendezvous_shard("doc_id", n).alias("s")
        ).collect()
    }
    for i in ids:
        scores = [
            (int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:8], 16), s)
            for s in range(n)
        ]
        assert got[i] == max(scores)[1], i
