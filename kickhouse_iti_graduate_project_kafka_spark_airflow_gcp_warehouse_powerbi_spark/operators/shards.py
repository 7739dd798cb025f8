"""Token-balanced shard assignment — laying a corpus out for training.

A training job reads shards of roughly equal *token* count (not equal doc
count: document lengths are heavy-tailed). Assigning shard ids needs the
global running token total in a canonical document order — a prefix sum,
which naive Spark code writes as one window over ALL rows
(``Window.orderBy(...)`` with no partition), collapsing 100 TB onto a
single task.

This module computes the prefix sum the scalable way (the classic
two-phase parallel scan):

1. **bucket partials** — docs are grouped into contiguous id buckets
   (``bucket = id div bucket_width``); one hash-aggregate computes each
   bucket's token sum.
2. **bucket offsets** — a running sum over the *bucket* rows (thousands of
   rows, not billions: a single-partition window here is O(n_buckets) and
   deliberate) yields each bucket's starting offset.
3. **local scan + join** — the per-bucket offset joins back (broadcast;
   the offset table is tiny) and an intra-bucket window — partitioned by
   bucket, so fully parallel — finishes the scan.

``shard_id = (global_prefix_before_doc) div target_tokens`` — exact
integer arithmetic end to end (no doubles: at 25T+ tokens a double's 53-bit
mantissa would misplace shard boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def global_prefix(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    bucket_width: int = 10_000,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Adds ``_prefix`` — the exclusive running sum of ``weight_col`` in
    canonical ``order_col`` order — via the two-phase parallel scan
    described in the module docstring. Exact long arithmetic throughout.
    Callers must drop ``_prefix`` (and may drop ``_bucket``) when done.

    If ``order_col`` is not unique, pass ``tiebreak_cols`` that complete a
    total order — otherwise tied rows receive their prefix values in
    partition-dependent order (nondeterministic across runs/engines)."""
    w = F.col(weight_col).cast("long")
    bucketed = df.withColumn(
        "_bucket", F.expr(f"{order_col} div {bucket_width}").cast("long")
    )
    partials = bucketed.groupBy("_bucket").agg(F.sum(w).alias("_bsum"))
    # running sum over bucket rows only — O(n_buckets), intentionally tiny
    bw = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_bucket", F.coalesce(F.sum("_bsum").over(bw), F.lit(0)).alias("_offset")
    )
    iw = (
        Window.partitionBy("_bucket")
        .orderBy(order_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(broadcast(offsets), "_bucket")
        .withColumn(
            "_prefix", F.col("_offset") + F.coalesce(F.sum(w).over(iw), F.lit(0))
        )
        .drop("_offset")
    )


def token_balanced_shards(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    target_per_shard: int,
    bucket_width: int = 10_000,
) -> DataFrame:
    """Adds ``shard_id`` such that consecutive documents (by ``order_col``)
    accumulate into shards of ~``target_per_shard`` total ``weight_col``.

    A document lands in the shard its *starting* offset falls into, so every
    shard's total is < target + max_doc_weight and the assignment is a pure
    function of the input — reproducible across retries and engines.
    """
    return (
        global_prefix(df, weight_col, order_col, bucket_width)
        .withColumn("shard_id", F.expr(f"_prefix div {target_per_shard}").cast("long"))
        .drop("_bucket", "_prefix")
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    hex_digits: int = 15,
) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE of a corpus into ``n_shards`` training
    shards — the 'randomize document order before training' op, as a pure
    function of the id (no ``rand()``: reproducible across retries,
    engines, and repartitioning).

    The permutation key is the first ``hex_digits`` (60 bits) of
    md5(id-as-string) parsed as an integer — engine-portable (the same
    md5-bucket contract the sampling/split ops use). The global rank of
    that key is the document's position in the shuffled order; documents
    are dealt round-robin into shards:

        shard        = rank % n_shards
        pos_in_shard = rank div n_shards

    so every shard is a uniform pseudo-random 1/n sample AND carries its
    own dense, gap-free loader order.

    Scale posture (100 TB): the rank is the two-phase parallel prefix scan
    (``global_prefix``) over the uniform key space — per-bucket hash
    aggregate, an O(n_buckets) offsets window, and per-bucket local
    windows. Never a single global ORDER BY window. Key collisions
    (~N²/2^61) are totally ordered by the id tie-break, which the oracle
    replays.

    Output: (id_col, shard int, pos_in_shard long).
    """
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, hex_digits), 16, 10
    ).cast("long")
    keyed = df.select(F.col(id_col), key.alias("_key"), F.lit(1).alias("_one"))
    # keys are uniform over [0, 16^hex_digits) — carve that space into
    # ~4096 equal-width buckets for the two-phase scan
    width = max(16**hex_digits // 4096, 1)
    ranked = global_prefix(
        keyed, "_one", "_key", bucket_width=width, tiebreak_cols=(id_col,)
    )
    return ranked.select(
        id_col,
        F.pmod(F.col("_prefix"), F.lit(n_shards)).cast("int").alias("shard"),
        F.expr(f"_prefix div {n_shards}").cast("long").alias("pos_in_shard"),
    )


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    seq_len: int,
    bucket_width: int = 10_000,
) -> DataFrame:
    """Sequence-packing layout: concatenate documents in ``order_col``
    order and cut the token stream into fixed-length training sequences of
    ``seq_len`` tokens. Returns one row per (document, sequence) slice —
    ``seq_id`` plus ``begin_tok``/``end_tok`` offsets WITHIN the document
    (a long document spans several sequences; several short ones share
    one). Every sequence except the last covers exactly ``seq_len`` tokens
    by construction.

    This is the packing step a GPT-style data loader runs before
    tokenizer-side concat: computing it in the engine makes the layout a
    pure function of the corpus (retry/engine reproducible) instead of
    loader state. All arithmetic is exact long prefix sums (two-phase
    scan — never a single-partition window over the corpus); the explode
    emits ceil(w/seq_len)+1 rows per doc at most, so output ∝ corpus
    tokens / seq_len + docs."""
    w = F.col(weight_col).cast("long")
    pref = global_prefix(df, weight_col, order_col, bucket_width).filter(w > 0)
    out = (
        pref.withColumn("_first", F.expr(f"_prefix div {int(seq_len)}"))
        .withColumn("_last", F.expr(f"(_prefix + {weight_col} - 1) div {int(seq_len)}"))
        .withColumn("seq_id", F.explode(F.sequence(F.col("_first"), F.col("_last"))))
        .withColumn(
            "begin_tok",
            F.greatest(F.col("seq_id") * seq_len, F.col("_prefix")) - F.col("_prefix"),
        )
        .withColumn(
            "end_tok",
            F.least((F.col("seq_id") + 1) * seq_len, F.col("_prefix") + w)
            - F.col("_prefix"),
        )
        .drop("_bucket", "_prefix", "_first", "_last")
    )
    return out


def write_packed_sequences(
    df: DataFrame,
    path: str,
    weight_col: str,
    order_col: str,
    seq_len: int,
    seqs_per_shard: int = 10_000,
    bucket_width: int = 10_000,
) -> None:
    """Materialize the packing layout for a data loader:
    ``seq_shard=N/`` parquet partitions each holding ``seqs_per_shard``
    consecutive training sequences' slice rows, internally ordered by
    (seq_id, order_col) so a loader reads one shard directory and walks
    slices in emission order. Partition pruning makes "give me sequences
    [a, b)" a directory-range read — the loader never lists the corpus.
    The sort leads with the partition column (FileFormatWriter drops
    secondary sort keys otherwise — documented Spark quirk)."""
    packed = pack_sequences(df, weight_col, order_col, seq_len, bucket_width)
    (
        packed.withColumn(
            "seq_shard", F.expr(f"seq_id div {int(seqs_per_shard)}").cast("long")
        )
        .sortWithinPartitions("seq_shard", "seq_id", order_col)
        .write.partitionBy("seq_shard")
        .mode("overwrite")
        .parquet(path)
    )


def write_token_shards(
    df: DataFrame,
    path: str,
    weight_col: str,
    order_col: str,
    target_per_shard: int,
) -> None:
    """Materialize the corpus as ``shard_id=N/`` parquet partitions, each
    internally ordered by ``order_col``. The sort leads with the partition
    column — FileFormatWriter silently drops secondary sort keys otherwise
    (documented Spark quirk)."""
    token_balanced_shards(df, weight_col, order_col, target_per_shard).sortWithinPartitions(
        "shard_id", order_col
    ).write.partitionBy("shard_id").mode("overwrite").parquet(path)


def rendezvous_shard(id_col: str | F.Column, n_shards: int) -> F.Column:
    """Rendezvous (highest-random-weight) shard assignment — the ELASTIC
    alternative to ``pmod`` sharding: every (doc, shard) pair gets an
    engine-portable md5 score and the doc lives on its argmax shard.
    Growing n -> n+1 relocates only the docs the NEW shard wins
    (~1/(n+1) of the corpus, and they ALL move to the new shard) instead
    of pmod's (n-1)/n reshuffle-almost-everything — the property that
    lets a training-data layout add shards without rewriting history.

    Column expression only (argmax over an n-element struct array per
    row — no shuffle at all); structs compare lexicographically in both
    Spark and the SQL oracle, so ties (2^-32 per pair) break to the
    higher shard id identically everywhere. Keep n_shards here in the
    tens-to-hundreds: the expression tree is O(n_shards)."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    entries = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(idc.cast("string"), F.lit(f":{s}"))), 1, 8
                ),
                16,
                10,
            ).cast("long").alias("h"),
            F.lit(s).alias("s"),
        )
        for s in range(n_shards)
    ]
    return F.array_max(F.array(*entries))["s"]
