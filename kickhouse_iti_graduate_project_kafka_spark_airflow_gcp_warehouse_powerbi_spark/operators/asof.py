"""As-of join — nearest-event enrichment without a range cross-product.

The reference has no as-of join (SURVEY.md §2.4: its "latest state" need is
served by argMax views), but the surrounding ecosystem does — ClickHouse
``ASOF JOIN``, DuckDB ``ASOF JOIN`` — and a training-data/eventstream
pipeline hits the shape constantly: attribute each conversion to the latest
prior touch, stamp each reading with the most recent calibration, join a
fact to the dimension snapshot that was current *at the fact's own time*.

Spark has no built-in as-of join, and the naive encodings are scale traps:

- ``left JOIN right ON key AND r.ts <= l.ts`` + latest-per-pair dedup
  materializes every (left row × all earlier right rows) pair — quadratic
  per key before the dedup prunes it;
- a correlated subquery per left row is not expressible in DataFrame ops.

This implementation is the *union-tag sweep*: tag right rows 0 / left rows
1, union them, and run one window sorted by (ts, side) per key carrying the
last non-null right payload forward (``F.last(ignorenulls=True)`` over
``UNBOUNDED PRECEDING .. CURRENT ROW``). Each left row then holds exactly
the right row an ASOF JOIN would pick, in **one shuffle on the key and one
linear sort-scan** — the same cost envelope as a sort-merge join, with
per-key state of a single payload struct.

Scale posture (100 TB): cost is sort-shuffle on ``on`` keys, identical to
any equi-join on the same keys; no intermediate blow-up regardless of how
many right rows precede a left row. A pathologically hot key serializes
into one task's linear scan (windows cannot be salted without breaking the
carry) — for that shape use :func:`asof_join_bucketed`, which pre-buckets
by coarse time range and sweeps within (key, range) partitions, seeding
each range with the previous range's last right row so results are
identical to the plain sweep while a single key parallelizes across
``time_span / bucket`` tasks.

Tie semantics match DuckDB/ClickHouse ASOF: ``backward`` matches the
latest right row with ``r.ts <= l.ts`` (equal timestamps DO match, because
right rows sort before left rows at the same instant); ``forward`` matches
the earliest right row with ``r.ts >= l.ts``. Among right rows sharing one
exact timestamp the winner follows ``tiebreak`` (highest wins backward,
lowest wins forward). Engines leave that corner unspecified — and the r11
skewed sweep caught it biting for real: a whale user aggregating events
from many sources accumulates duplicate (key, ts) rows, and without a
pinned order the engine and the oracle silently chose different winners.
Production queries over data that can tie should ALWAYS pass ``tiebreak``
(the catalog as-of queries pass ``event_id``); an oracle replicates the
contract by collapsing right rows to MAX(tiebreak) per (key, ts) backward
/ MIN forward before its native ASOF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAY = "__asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    tolerance_micros: int | None = None,
    right_prefix: str = "r_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the nearest
    ``right`` row per ``on`` key at-or-before (``backward``) or at-or-after
    (``forward``) its ``left_ts``; unmatched left rows keep NULL right
    columns (ASOF LEFT JOIN semantics).

    Right columns (minus the join keys) come back prefixed with
    ``right_prefix``; the matched right timestamp is ``{right_prefix}{right_ts}``.
    ``tolerance_micros`` voids matches farther than that many microseconds
    from the left timestamp (both directions), like pandas ``merge_asof``'s
    ``tolerance``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    pay_cols = [c for c in right.columns if c not in on]
    left_carry = [c for c in left.columns if c not in on]
    if right_ts not in pay_cols:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")

    # One unioned relation: right rows carry their payload struct, left rows
    # carry their own non-key columns. Null-typed placeholders keep the
    # union by-name exact without allowMissingColumns surprises.
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in pay_cols]).alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_carry],
    )
    l_tagged = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None)
        .cast(r_tagged.schema[_PAY].dataType)
        .alias(_PAY),
        *[F.col(c) for c in left_carry],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # Sweep order: time, then side (right first at equal ts so the equality
    # edge of the inequality is inclusive), then the right-row tiebreak.
    def _ordered(c: Column) -> Column:
        return c.asc() if direction == "backward" else c.desc()

    order = [_ordered(F.col(_TS)), F.col(_SIDE).asc()]
    if tiebreak is not None:
        order.append(_ordered(F.col(_PAY).getField(tiebreak)))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))

    matched = F.col(_PAY)
    if tolerance_micros is not None:
        gap = F.abs(
            F.unix_micros(F.col(_TS)) - F.unix_micros(matched.getField(right_ts))
        )
        matched = F.when(gap <= F.lit(tolerance_micros), matched)

    out_left = [F.col(c) for c in left.columns]
    out_right = [
        matched.getField(c).alias(f"{right_prefix}{c}") for c in pay_cols
    ]
    return swept.filter(F.col(_SIDE) == 1).select(*out_left, *out_right)


_BKT = "__asof_bucket"
_SEED = "__asof_seed"


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    bucket_micros: int,
    direction: str = "backward",
    tolerance_micros: int | None = None,
    right_prefix: str = "r_",
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join identical in result to :func:`asof_join`, with the sweep
    partitioned by (key, coarse-time-bucket) instead of key alone — the
    hot-key mitigation the plain sweep's docstring prescribes.

    Mechanics (backward; forward is the mirror):

    1. every row gets ``bucket = floor(epoch_us(ts) / bucket_micros)``;
    2. per (key, bucket), the latest right payload is aggregated
       (``max_by`` — a map-side-combinable agg, so even a bucket with a
       billion right rows reduces without a window);
    3. a window over the per-key *bucket sequence* (one row per distinct
       (key, bucket) on either side — bounded by time-span/bucket, not by
       row count) carries that payload forward and lags it one bucket:
       the **seed**, i.e. the right row that was current when the bucket
       opened;
    4. the union-tag sweep runs per (key, bucket) with the seed injected
       as a side ``-1`` row at the bucket boundary, so in-bucket right
       rows overwrite it and left rows with no earlier in-bucket right
       row fall back to it.

    A key holding ~all rows therefore spreads over ``time_span /
    bucket_micros`` tasks; only the per-bucket aggregate (tiny) passes
    through a per-key window. Tolerance still compares against the
    matched right row's TRUE timestamp (carried inside the payload
    struct), so a stale seed voids exactly as in the plain sweep.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if bucket_micros <= 0:
        raise ValueError("bucket_micros must be positive")
    on = list(on)
    pay_cols = [c for c in right.columns if c not in on]
    left_carry = [c for c in left.columns if c not in on]
    if right_ts not in pay_cols:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")
    backward = direction == "backward"

    def _bucket(ts_col: Column) -> Column:
        return F.floor(F.unix_micros(ts_col) / F.lit(bucket_micros)).cast("long")

    # The right leg feeds two consumers (per-bucket bests, the final
    # union) and the left leg two (bucket ids, the final union).
    # Deliberately NOT persisted: the legs are a scan + codegen
    # projection, and an A/B at sf0.1 showed memory-store materialization
    # costs MORE than the recompute it saves. With seeds derived from the
    # aggregated extrema (no domain join), the skew-free overhead vs the
    # plain sweep is ~1.15x warm best-of at sf0.1 — the price of the two
    # small bucket-level shuffles that buy hot-key parallelism.
    r_tagged = (right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias(_TS),
        _bucket(F.col(right_ts)).alias(_BKT),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in pay_cols]).alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_carry],
    ))
    l_tagged = (left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias(_TS),
        _bucket(F.col(left_ts)).alias(_BKT),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r_tagged.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c) for c in left_carry],
    ))

    # (2)+(3) fused (r13, guide §2.4): ONE bucket-level aggregate over a
    # narrow union of both tagged legs replaces the former pair
    # (right-side ``max_by`` aggregate + left-side ``distinct`` domain,
    # each its own exchange, unioned into a third): per (key, bucket) it
    # yields the best right payload (``max_by``/``min_by`` over an
    # ordering that is NULL on left rows, so they never win — struct
    # comparison is lexicographic, matching the sweep's order) and
    # whether any left row needs a seed (``max(side)``). The per-key
    # carry window then reads one row per (key, bucket) and excludes the
    # CURRENT bucket's best with a strict ``rowsBetween(.., -1)`` frame —
    # exactly what the old (bucket, side DESC) ordering achieved by
    # sorting the left marker before the same bucket's best. Only left
    # buckets need seeds: a right-only bucket contributes through its
    # best but never emits output rows.
    ord_fields = [F.col(_TS)]
    if tiebreak is not None:
        ord_fields.append(F.col(_PAY).getField(tiebreak))
    r_ord = F.when(F.col(_SIDE) == 0, F.struct(*ord_fields))
    best = F.max_by(F.col(_PAY), r_ord) if backward else F.min_by(
        F.col(_PAY), r_ord
    )
    narrow = [*on, _BKT, _SIDE, _TS, _PAY]
    bucket_level = (
        r_tagged.select(*narrow)
        .unionByName(l_tagged.select(*narrow))
        .groupBy(*on, _BKT)
        .agg(best.alias("__bucket_best"), F.max(_SIDE).alias("__has_left"))
    )
    seq = Window.partitionBy(*on).orderBy(
        F.col(_BKT).asc() if backward else F.col(_BKT).desc()
    )
    seeds = bucket_level.withColumn(
        _SEED,
        F.last("__bucket_best", ignorenulls=True).over(
            seq.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).filter((F.col("__has_left") == 1) & F.col(_SEED).isNotNull())
    # Seed sits at the bucket boundary (open edge for the sweep direction)
    # with side -1: ordered before every real row of the bucket, so any
    # in-bucket right row overwrites it.
    boundary_us = (
        F.col(_BKT) * F.lit(bucket_micros)
        if backward
        else (F.col(_BKT) + 1) * F.lit(bucket_micros) - 1
    )
    seed_rows = seeds.select(
        *[F.col(k) for k in on],
        F.timestamp_micros(boundary_us).alias(_TS),
        F.col(_BKT),
        F.lit(-1).alias(_SIDE),
        F.col(_SEED).alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_carry],
    )

    unioned = r_tagged.unionByName(l_tagged).unionByName(seed_rows)

    def _ordered(c: Column) -> Column:
        return c.asc() if backward else c.desc()

    order = [_ordered(F.col(_TS)), F.col(_SIDE).asc()]
    if tiebreak is not None:
        order.append(_ordered(F.col(_PAY).getField(tiebreak)))
    w = (
        Window.partitionBy(*on, _BKT)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))

    matched = F.col(_PAY)
    if tolerance_micros is not None:
        gap = F.abs(
            F.unix_micros(F.col(_TS)) - F.unix_micros(matched.getField(right_ts))
        )
        matched = F.when(gap <= F.lit(tolerance_micros), matched)

    out_left = [F.col(c) for c in left.columns]
    out_right = [
        matched.getField(c).alias(f"{right_prefix}{c}") for c in pay_cols
    ]
    return swept.filter(F.col(_SIDE) == 1).select(*out_left, *out_right)


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    bucket_micros: int,
    share_threshold: float = 0.05,
    direction: str = "backward",
    tolerance_micros: int | None = None,
    right_prefix: str = "r_",
    tiebreak: str | None = None,
    sketch=None,
) -> DataFrame:
    """Skew-gated as-of join: probe the right side's key distribution with
    the count-min sketch (operators/heavy.estimated_top_share — one narrow
    pass, ``depth`` scalar rows to the driver) and pick the variant the
    data actually needs: the plain per-key sweep when keys are spread, the
    (key, time-bucket) sweep when any key's share bound exceeds
    ``share_threshold``.

    Both variants are result-identical (shared oracle + hypothesis suite),
    so the gate is purely physical — this is the "observed key-frequency
    sketch" planner step the bucketed variant's constant overhead asks
    for: uniform inputs skip it, genuinely skewed inputs pay it and win
    back wall-clock on the hot key.

    ``sketch`` (a ``heavy.KeyFreqSketch`` built over the RIGHT side's
    ``on`` keys, e.g. via ``heavy.build_key_sketch``) skips the probe
    pass — a pipeline that also extracts heavy hitters from the same
    side pays the sketch once and shares the handle with both."""
    from .heavy import should_salt

    kwargs = dict(
        direction=direction,
        tolerance_micros=tolerance_micros,
        right_prefix=right_prefix,
        tiebreak=tiebreak,
    )
    if should_salt(right, list(on), share_threshold=share_threshold, sketch=sketch):
        return asof_join_bucketed(
            left, right, on, left_ts, right_ts, bucket_micros=bucket_micros, **kwargs
        )
    return asof_join(left, right, on, left_ts, right_ts, **kwargs)
