"""Heavy hitters over ultra-high-cardinality keys: count-min candidate
filter + exact verify.

A plain ``groupBy(key).count()`` already does map-side partial
aggregation, but its shuffle volume is the number of DISTINCT keys per
task — at 100 TB (billions of user ids / URLs / n-grams) that shuffle IS
the job. The classic streaming-sketch answer bounds it:

1. **Sketch pass** — a count-min sketch expressed as DataFrame ops: each
   row hashes into ``depth`` buckets of a ``width``-sized table
   (``pmod(xxhash64(key, seed_i), width)``); one ``groupBy(i, bucket)``
   counts them. The shuffle is at most ``depth x width`` rows PER TASK
   regardless of key cardinality, and the aggregated sketch (≤ depth x
   width rows total) is broadcast-small by construction.
2. **Candidate filter** — a key can only reach ``min_count`` if ALL of
   its ``depth`` buckets did (count-min never under-counts), so rows are
   pre-filtered with ``depth`` broadcast LEFT SEMI joins against the
   heavy buckets. No false negatives are possible; false positives are
   only hash collisions that the next pass removes.
3. **Exact verify** — ``groupBy(key).count()`` over the surviving rows
   only. The expensive by-key shuffle now carries just the candidate
   rows, and the result is EXACT: precisely the keys with true frequency
   ``>= min_count`` — which is what makes the operator oracle-checkable
   against plain SQL ``HAVING count(*) >= T``.

The same sketch doubles as a cheap skew probe: ``estimated_top_share``
reads ``depth`` scalar rows (min over rows of the max bucket count) —
a count-min upper bound on the hottest key's frequency share, the gate a
planner needs to decide salting / hot-key bucketing *before* paying a
skewed shuffle (see operators/skew.py, operators/asof.py).

Scale posture (100 TB): the input is scanned twice (sketch + verify) —
both scans are narrow map-side work with column-pruned reads of the key
columns only; neither shuffles the corpus. Callers that already have the
input materialized can persist it, but at corpus scale the second scan is
the cheaper trade vs caching 100 TB.

Reference parity: the reference stack profiles hot keys with ClickHouse's
``topK``/``approx_top_k`` (mergeable space-saving sketch) on the
warehouse side; this operator is the Spark-first equivalent with an exact
(rather than approximate) final answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sketch depth: probability a non-heavy key passes the candidate filter
#: falls exponentially in depth (each level is an independent hash)
DEFAULT_DEPTH = 3
#: sketch width: collision rate per level ~ (distinct keys) / width; the
#: aggregated sketch stays <= depth x width rows (24k at the default) —
#: broadcast-small however large the input
DEFAULT_WIDTH = 8192


def _bucket_col(key_cols: list[str], i: int, width: int, seed: int) -> Column:
    """Level-``i`` count-min bucket: seeded xxhash64 of the key tuple.

    The level index is mixed in as an extra hash INPUT (not the xxhash64
    seed parameter) so the ``depth`` hash functions are pairwise
    independent for composite keys too."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed * 1000003 + i)),
        F.lit(width),
    ).cast("int")


def cm_sketch(
    df: DataFrame,
    key_cols: list[str],
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 0,
) -> DataFrame:
    """Count-min sketch as a DataFrame: (i, bucket, cnt) rows, one per
    non-empty cell. Mergeable by construction — sketches of two inputs
    union + re-aggregate with ``sum`` (tested), which is what an
    incremental / per-partition rollup needs."""
    pairs = df.select(
        F.posexplode(
            F.array(*[_bucket_col(key_cols, i, width, seed) for i in range(depth)])
        ).alias("i", "bucket")
    )
    return pairs.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


class KeyFreqSketch:
    """A materialized count-min sketch plus the parameters that built it —
    the shareable handle for every sketch consumer (``heavy_hitters``,
    ``estimated_top_share``/``should_salt``, ``asof_join_auto``): a
    pipeline that gates both a heavy-hitter extraction and a skew-aware
    join on the same keys builds ONE sketch pass and feeds it to each
    (VERDICT r5 item 8). Parameters ride along because a sketch consumed
    with a different width/seed/key-set would silently mis-filter —
    consumers validate and raise instead."""

    def __init__(self, df, key_cols, depth, width, seed):
        self.df = df
        self.key_cols = list(key_cols)
        self.depth = depth
        self.width = width
        self.seed = seed

    def check(self, key_cols: list[str]) -> None:
        if list(key_cols) != self.key_cols:
            raise ValueError(
                f"sketch was built over keys {self.key_cols}, "
                f"asked to serve {list(key_cols)}"
            )


def build_key_sketch(
    df: DataFrame,
    key_cols: list[str],
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 0,
    materialize: bool = True,
) -> KeyFreqSketch:
    """ONE sketch pass over ``df``'s keys, persisted (<= depth x width
    tiny rows) so every consumer reads the cached cells instead of
    re-scanning the input. Call ``.df.unpersist()`` when done."""
    sk = cm_sketch(df, key_cols, depth=depth, width=width, seed=seed)
    if materialize:
        sk = sk.persist()
        sk.count()
    return KeyFreqSketch(sk, key_cols, depth, width, seed)


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    min_count: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 0,
    sketch: KeyFreqSketch | None = None,
) -> DataFrame:
    """EXACT keys with frequency ``>= min_count`` (columns: key_cols +
    ``cnt``), computed with a count-min candidate filter so the by-key
    shuffle only ever carries candidate rows (see module docstring).

    Equivalent to ``SELECT key, count(*) FROM t GROUP BY key HAVING
    count(*) >= min_count`` — the sketch changes the physical plan, never
    the answer. ``sketch`` (a :class:`KeyFreqSketch` over the SAME df and
    keys) skips the sketch pass."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if sketch is not None:
        sketch.check(key_cols)
        depth, width, seed = sketch.depth, sketch.width, sketch.seed
        sk = sketch.df
    else:
        # the sketch feeds one broadcast build PER LEVEL; unpersisted,
        # each build recomputes the full sketch pass from the source
        # (depth scans + aggregates of the input for a <= depth x width
        # row result). Registered persist — released by the session's
        # release_tracked sweep.
        from .cachereg import track as _persist

        sk = _persist(cm_sketch(df, key_cols, depth=depth, width=width, seed=seed))
    heavy = sk.filter(F.col("cnt") >= min_count)
    cand = df
    for i in range(depth):
        hb = heavy.filter(F.col("i") == i).select(F.col("bucket").alias(f"_hb{i}"))
        cand = cand.withColumn(f"_b{i}", _bucket_col(key_cols, i, width, seed)).join(
            F.broadcast(hb), F.col(f"_b{i}") == F.col(f"_hb{i}"), "left_semi"
        )
    return (
        cand.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def estimated_top_share(
    df: DataFrame,
    key_cols: list[str],
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 0,
    sketch: KeyFreqSketch | None = None,
) -> float:
    """Count-min UPPER BOUND on the hottest key's frequency share, from
    one sketch pass: ``min over levels of (max bucket count) / N``.

    Driver reads exactly ``depth`` scalar rows + one count — the bounded-
    read posture shared with cc.py's per-round fingerprint. Returns 0.0
    for an empty input. Because it is an upper bound, using it as a skew
    gate (``should_salt``) can only over-trigger mitigation, never miss
    real skew. ``sketch`` reuses a shared :class:`KeyFreqSketch`."""
    if sketch is not None:
        sketch.check(key_cols)
        sk = sketch.df
    else:
        sk = cm_sketch(df, key_cols, depth=depth, width=width, seed=seed)
    rows = (
        sk.groupBy("i")
        .agg(F.max("cnt").alias("mx"), F.sum("cnt").alias("n"))
        .collect()
    )
    if not rows:
        return 0.0
    return min(r["mx"] / r["n"] for r in rows)


def should_salt(
    df: DataFrame,
    key_cols: list[str],
    share_threshold: float = 0.05,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 0,
    sketch: KeyFreqSketch | None = None,
) -> bool:
    """Skew gate: True when the sketch's top-key share bound exceeds
    ``share_threshold`` — the cheap pre-check before choosing
    ``skew.salted_*`` / ``asof.asof_join_bucketed`` over their plain
    variants. One narrow pass over the key columns (or zero with a shared
    ``sketch``); never shuffles the corpus by key."""
    return estimated_top_share(
        df, key_cols, depth=depth, width=width, seed=seed, sketch=sketch
    ) > share_threshold
