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
carry) — if one key owns billions of rows, pre-bucket by coarse time range
and as-of join within ranges, seeding each range with the previous range's
last right row.

Tie semantics match DuckDB/ClickHouse ASOF: ``backward`` matches the
latest right row with ``r.ts <= l.ts`` (equal timestamps DO match, because
right rows sort before left rows at the same instant); ``forward`` matches
the earliest right row with ``r.ts >= l.ts``. Among right rows sharing one
exact timestamp the winner follows ``tiebreak`` (highest wins backward,
lowest wins forward); engines leave this unspecified, so oracle fixtures
must be tie-free on (key, ts) — the driver tables are (verified at all
scale factors).
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
