"""Persisted perceptual-hash index — the multimodal ingest gate.

Completes the symmetry with the text side: ``dedup.build_dedup_index`` /
``absorb_batch_into_index`` gate a DOCUMENT stream on shingle hashes;
this module gates an IMAGE/AUDIO/VIDEO stream on perceptual hashes.
Modality-agnostic: callers feed (id, hash) rows from any of the three
kernels (``imagehash.dhash_images``, ``audiohash.energy_hash_audio``,
per-frame ``videohash.video_frame_hashes`` reduced to a per-video hash)
— the index only sees 63-bit hashes.

Layout under ``path``:

- ``bands``  — the banded inverted index: (id, hash, band, bucket) rows
  Hive-partitioned by (band, bdir = bucket % n_bucket_dirs). An arriving
  batch prunes to ITS hashes' (band, bdir) directories — batch-sized
  reads for gate-sized batches, the `bm25` term-bucket discipline. At
  hyperscale (huge batches touching every dir) this lookup belongs in a
  KV/secondary index; the banding and verify semantics carry over.
- ``ids``    — (id, hash) registry: replay guard + the forget path's
  source of each id's band directories.
- ``meta``   — (n_bucket_dirs, max_hamming) so absorbs refuse a
  parameter mismatch instead of silently mis-gating.

Crash posture (append order = bands THEN ids): ids is the commit
marker. A crash between the two appends leaves duplicated bands rows on
retry — absorbed reads ``dropDuplicates`` them (byte-identical rows, so
semantics are exact); an id is never registered before its bands are
queryable, so the gate can never silently wave a near-dup through.
Replays converge: registered ids classify as ``n_replayed`` and append
nothing.

Decision rule: a batch hash is REJECTED when some stored hash (or an
accepted lower-id in-batch hash) is within Hamming distance
``max_hamming`` (band-exact recall for distance <= 3 by the 4x16-bit
pigeonhole); the in-batch rule keeps the lowest id of each near-group —
the same convention as the text absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def _banded(df: DataFrame, id_col: str, hash_col: str, n_bucket_dirs: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("hash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        "id", "hash", "bb.band", "bb.bucket",
        F.pmod(F.col("bb.bucket"), F.lit(n_bucket_dirs)).cast("int").alias("bdir"),
    )


def build_phash_index(
    hashes: DataFrame,
    path: str,
    id_col: str = "doc_id",
    hash_col: str = "hash",
    n_bucket_dirs: int = 64,
    max_hamming: int = 3,
) -> dict:
    """Materialize the gate state from a corpus of (id, hash) rows.
    NULL hashes (undecodable payloads) are excluded — they can never
    gate anything. Returns {n_ids, n_band_rows}."""
    spark = hashes.sparkSession
    src = (
        hashes.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(hash_col).cast("long").alias("hash"),
        )
        .filter(F.col("hash").isNotNull() & F.col("id").isNotNull())
        .dropDuplicates(["id"])
    )
    bands = _banded(src, "id", "hash", n_bucket_dirs)
    (
        bands.repartition(4 * n_bucket_dirs, "band", "bdir")
        .sortWithinPartitions("band", "bdir", "bucket", "id")
        .write.partitionBy("band", "bdir")
        .mode("overwrite")
        .parquet(f"{path}/bands")
    )
    src.write.mode("overwrite").parquet(f"{path}/ids")
    spark.createDataFrame(
        [(int(n_bucket_dirs), int(max_hamming))],
        "n_bucket_dirs int, max_hamming int",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    n_ids = src.count()
    return {"n_ids": int(n_ids), "n_band_rows": int(n_ids * 4)}


def absorb_batch_into_phash_index(
    spark: SparkSession,
    path: str,
    batch_hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "hash",
) -> dict:
    """Gate one batch of (id, hash) rows against the index and grow it
    with the accepted ids (module docstring semantics / crash posture).
    Returns {n_batch, n_accepted, n_rejected_near, n_rejected_batch,
    n_replayed, n_null_hash}."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]  # 1 row
    n_dirs, max_h = int(meta["n_bucket_dirs"]), int(meta["max_hamming"])

    raw = batch_hashes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(hash_col).cast("long").alias("hash"),
    ).dropDuplicates(["id"])
    n_raw = raw.count()
    src = raw.filter(F.col("hash").isNotNull() & F.col("id").isNotNull())
    n_null = n_raw - src.count()

    # replay guard first: at-least-once redelivery of registered ids
    registered = spark.read.parquet(f"{path}/ids").select("id")
    fresh = src.join(registered, "id", "left_anti").localCheckpoint()
    n_fresh = fresh.count()
    n_replayed = n_raw - n_null - n_fresh
    if n_fresh == 0:
        return {
            "n_batch": int(n_raw), "n_accepted": 0, "n_rejected_near": 0,
            "n_rejected_batch": 0, "n_replayed": int(n_replayed),
            "n_null_hash": int(n_null),
        }

    bb = _banded(fresh, "id", "hash", n_dirs)
    # bounded collect: the batch's (band, bdir) partition list
    dirs = [
        (r["band"], r["bdir"])
        for r in bb.select("band", "bdir").distinct().collect()
    ]
    stored = (
        spark.read.parquet(f"{path}/bands")
        # partition pruning on an arithmetic combination of the two
        # partition columns (evaluable from directory values alone)
        .filter(
            (F.col("band") * n_dirs + F.col("bdir")).isin(
                [b * n_dirs + d for b, d in dirs]
            )
        )
        # crash-retry duplicate bands rows are byte-identical; drop them
        .dropDuplicates(["id", "band", "bucket"])
        # a stored row carrying a BATCH id is this batch's own torn
        # append (the replay guard already removed registered ids) —
        # without this exclusion the retry would reject the doc against
        # its own orphan rows and the id would never commit
        .join(F.broadcast(fresh.select("id")), "id", "left_anti")
    )
    near_stored = (
        bb.alias("q")
        .join(
            stored.alias("s"),
            (F.col("q.band") == F.col("s.band"))
            & (F.col("q.bucket") == F.col("s.bucket")),
        )
        .filter(
            F.bit_count(F.col("q.hash").bitwiseXOR(F.col("s.hash"))) <= max_h
        )
        .select(F.col("q.id").alias("id"))
        .distinct()
    )
    clean = fresh.join(near_stored, "id", "left_anti")
    n_near = n_fresh - clean.count()

    # in-batch domination among survivors: lowest id of each near-group
    # wins (same convention as the text absorb)
    from .dedup import hamming_band_pairs

    drop = (
        hamming_band_pairs(clean, "id", "hash", max_h)
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    final = clean.join(drop, "id", "left_anti").localCheckpoint()
    n_final = final.count()
    stats = {
        "n_batch": int(n_raw),
        "n_accepted": int(n_final),
        "n_rejected_near": int(n_near),
        "n_rejected_batch": int(n_fresh - n_near - n_final),
        "n_replayed": int(n_replayed),
        "n_null_hash": int(n_null),
    }
    if n_final == 0:
        return stats
    # append order = crash posture: bands first, ids = commit marker
    _banded(final, "id", "hash", n_dirs).write.partitionBy("band", "bdir").mode(
        "append"
    ).parquet(f"{path}/bands")
    final.write.mode("append").parquet(f"{path}/ids")
    return stats


def forget_from_phash_index(
    spark: SparkSession, path: str, ids: DataFrame, id_col: str = "doc_id"
) -> dict:
    """Takedown (operators/forget.py discipline): the ids registry holds
    each id's hash, so the affected (band, bdir) partitions are
    computable without scanning — prune, rewrite, drop emptied dirs,
    then rewrite the registry. Anti-joins no-op on retry."""
    from .forget import _delete_from_partitioned

    meta = spark.read.parquet(f"{path}/meta").collect()[0]  # 1 row
    n_dirs = int(meta["n_bucket_dirs"])
    gone = (
        spark.read.parquet(f"{path}/ids")
        .join(
            F.broadcast(
                ids.select(F.col(id_col).cast("long").alias("id")).distinct()
            ),
            "id",
            "left_semi",
        )
        .localCheckpoint()
    )
    gone_ids = gone.select("id")
    # bands is partitioned by TWO columns; delete per band with the
    # band's bdir list (the shared helper prunes one partition column)
    st = {"partitions_rewritten": 0, "partitions_dropped": 0, "n_deleted": 0}
    gb = _banded(gone, "id", "hash", n_dirs)
    for band in range(4):
        dirs = sorted(
            r["bdir"]
            for r in gb.filter(F.col("band") == band)
            .select("bdir")
            .distinct()
            .collect()
        )
        if not dirs:
            continue
        sub = _delete_from_partitioned(
            spark, f"{path}/bands/band={band}", "bdir",
            gone_ids, "id", parts=dirs,
        )
        for k in st:
            st[k] += sub[k]
    reg = spark.read.parquet(f"{path}/ids")
    remaining = reg.join(F.broadcast(gone_ids), "id", "left_anti").localCheckpoint()
    n_forgotten = reg.count() - remaining.count()
    remaining.write.mode("overwrite").parquet(f"{path}/ids")
    return {**st, "n_forgotten": int(n_forgotten)}


def maintain_phash_stream(
    stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    hash_col: str = "hash",
    trigger: str = "5 seconds",
    on_batch=None,
):
    """foreachBatch twin: gate a perceptual-hash stream against the
    persisted index (one transform, two drivers — the dedup_stream
    discipline). The upstream select typically maps payload → hash with
    one of the modality kernels before this sink."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        stats = absorb_batch_into_phash_index(
            batch_df.sparkSession, index_path, batch_df, id_col, hash_col
        )
        if on_batch is not None:
            on_batch(stats)

    return (
        stream.writeStream.foreachBatch(_process)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def phash_gate(
    stored_hashes: DataFrame,
    batch_hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "hash",
    max_hamming: int = 3,
) -> DataFrame:
    """The gate's decision algebra as a pure function — exactly what
    ``absorb_batch_into_phash_index`` computes, minus the persisted-index
    pruning and state growth (the catalog oracles this form closed-form;
    the absorb path is equivalence-tested against fresh builds).

    Accepted = batch ids that (a) have a non-NULL hash, (b) are within
    ``max_hamming`` of NO stored hash, and (c) are not dominated by a
    LOWER-id accepted candidate from the same batch (single-pass rule:
    x drops iff some batch survivor y < x is near x)."""
    from .dedup import hamming_band_pairs

    batch = batch_hashes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(hash_col).cast("long").alias("hash"),
    ).filter(F.col("hash").isNotNull()).dropDuplicates(["id"])
    stored = stored_hashes.select(
        F.col(id_col).cast("long").alias("s_id"),
        F.col(hash_col).cast("long").alias("s_hash"),
    ).filter(F.col("s_hash").isNotNull())
    both = batch.select("id", "hash", F.lit(True).alias("_b")).unionByName(
        stored.select(
            F.col("s_id").alias("id"), F.col("s_hash").alias("hash"),
            F.lit(False).alias("_b"),
        )
    )
    # persist_bands=False: ``both`` carries the FULL stored index whose
    # upstream is a cheap parquet read — re-scanning beats pinning 4 band
    # rows per stored hash (see hamming_band_pairs docstring)
    pairs = hamming_band_pairs(both, "id", "hash", max_hamming, persist_bands=False)
    # batch-vs-stored rejections (either orientation of the a<b pair)
    flags = both.select("id", "_b")
    p = (
        pairs.join(flags.withColumnRenamed("id", "a_id").withColumnRenamed("_b", "_ab"), "a_id")
        .join(flags.withColumnRenamed("id", "b_id").withColumnRenamed("_b", "_bb"), "b_id")
    )
    near_stored = (
        p.filter(F.col("_ab") & ~F.col("_bb")).select(F.col("a_id").alias("id"))
        .unionByName(
            p.filter(F.col("_bb") & ~F.col("_ab")).select(F.col("b_id").alias("id"))
        )
        .distinct()
    )
    clean = batch.join(near_stored, "id", "left_anti")
    drop = (
        hamming_band_pairs(clean, "id", "hash", max_hamming)
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    return clean.join(drop, "id", "left_anti").select(
        F.col("id").alias(id_col), F.col("hash").alias(hash_col)
    )
