"""Range (point-in-interval) join — bin-bucketed, no cross product.

The companion to ``operators/asof.py`` (SURVEY.md §2.4 note: the reference
has neither, but event pipelines need both): match every point row to ALL
interval rows containing it — error-episode attribution, maintenance-window
tagging, ad-flight matching. Plain Spark offers only two encodings, both
wrong at scale:

- an equi-join on the key followed by the range filter degenerates to a
  per-key cross product (every point × every interval of that key);
- no key at all makes Catalyst pick BroadcastNestedLoopJoin — quadratic.

The bucketed plan: pick ``bin_width`` >= the longest interval, explode each
interval to the (at most 2) bins it touches, map each point to its single
bin, equi-join on (keys..., bin), then apply the exact containment filter.
Each matched pair is produced exactly once — a point lives in one bin, and
an interval appears in that bin at most once — so no dedup pass is needed.

Scale posture (100 TB): one shuffle on (keys, bin); interval replication is
``len/bin_width + 1`` ≈ 2 rows. Candidate volume per reducer is bounded by
points-per-bin × intervals-overlapping-that-bin: narrow the bins (smaller
``bin_width``, more replicas per interval) to dilute dense keys — the
replication/skew trade-off every production range join tunes. Intervals
longer than ``bin_width`` are still answered correctly (the explode covers
every touched bin); they just replicate more.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_width_micros: int,
    interval_prefix: str = "i_",
) -> DataFrame:
    """Inner point-in-interval join: every ``points`` row paired with every
    ``intervals`` row (same ``on`` keys) whose
    ``[start_col, end_col]`` (timestamps, inclusive both ends) contains its
    ``point_col``. Interval columns (minus keys) return prefixed with
    ``interval_prefix``. Multi-match is expected output — one row per
    (point, containing interval)."""
    if bin_width_micros <= 0:
        raise ValueError("bin_width_micros must be positive")
    on = list(on)
    ipay = [c for c in intervals.columns if c not in on]
    if start_col not in ipay or end_col not in ipay:
        raise ValueError("start/end must be non-key interval columns")

    binned_i = intervals.select(
        *[F.col(k) for k in on],
        F.struct(*[F.col(c) for c in ipay]).alias("__ipay"),
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bin_width_micros),
                F.floor(F.unix_micros(F.col(end_col)) / bin_width_micros),
            )
        ).alias(_BIN),
    )
    binned_p = points.withColumn(
        _BIN, F.floor(F.unix_micros(F.col(point_col)) / bin_width_micros)
    )
    pay = F.col("__ipay")
    joined = binned_p.join(binned_i, on=[*on, _BIN], how="inner").filter(
        (F.col(point_col) >= pay.getField(start_col))
        & (F.col(point_col) <= pay.getField(end_col))
    )
    return joined.select(
        *[F.col(c) for c in points.columns],
        *[pay.getField(c).alias(f"{interval_prefix}{c}") for c in ipay],
    )
