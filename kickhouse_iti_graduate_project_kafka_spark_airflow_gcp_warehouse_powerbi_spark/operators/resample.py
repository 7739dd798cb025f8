"""Per-key time-grid resampling with forward fill.

Regularizing an irregular event series onto a fixed grid (here: hourly,
carrying the latest observation forward) is the preprocessing step behind
feature windows, charting, and gap-tolerant aggregation.

Two implementations, equivalence-tested against each other:

- :func:`hourly_ffill_resample` (PRIMARY) — fully native composition:
  per-key span aggregate -> hour-grid ``sequence`` explode -> the as-of
  union-tag sweep (`operators/asof.py`). Whole-stage codegen end to end;
  cost is one key-shuffle aggregate plus one key-window sweep. This
  replaced the grouped-map form as the default after benching showed
  ``applyInPandas`` paying ~2 ms of per-group pandas overhead — with
  thousands of SMALL groups (the common per-user shape) that fixed cost
  dominates the vectorized win (10.5 s vs ~1.5 s at sf0.1).
- :func:`hourly_ffill_resample_arrow` — the grouped-map
  (``applyInPandas``) extension point: each key's series is a bounded
  array and ``numpy.searchsorted`` over it is one vectorized call. The
  right choice when groups are FEW AND LARGE (per-group overhead
  amortizes) or when the per-group logic outgrows what native ops
  express (the general custom-stateful escape hatch this module
  documents).

Scale posture (100 TB): both paths shuffle once on the key; the native
sweep's memory is O(1) per row (window carry), the Arrow path's is one
key's series + grid per task (pre-split keys by coarse time range for
unbounded spans). All grid arithmetic is integer epoch-hours, so results
are independent of session timezone and engine float behavior.
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401  (mirrors sibling modules)

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000

_OUT_SCHEMA = "user_id long, hour_idx long, value double"


def _resample_one(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    pdf = pdf.sort_values("us")
    us = pdf["us"].to_numpy()
    h0 = int(-(-int(us[0]) // HOUR_US))  # ceil: grid starts AT/after first obs
    h1 = int(int(us[-1]) // HOUR_US)     # floor: last grid point before end
    if h1 < h0:
        return pd.DataFrame({"user_id": [], "hour_idx": [], "value": []}).astype(
            {"user_id": "int64", "hour_idx": "int64", "value": "float64"}
        )
    grid = np.arange(h0, h1 + 1, dtype=np.int64)
    idx = np.searchsorted(us, grid * HOUR_US, side="right") - 1
    return pd.DataFrame(
        {
            "user_id": np.repeat(pdf["user_id"].iloc[0], len(grid)),
            "hour_idx": grid,
            "value": pdf["value"].to_numpy()[idx],
        }
    )


def hourly_ffill_resample(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """One row per (key, epoch-hour) from each key's first observation
    (hour-ceiled) to its last (hour-floored), valued with the most recent
    observation at-or-before the grid instant. Keys whose span never
    crosses an hour boundary produce no rows.

    Native plan — interval cover, not grid-then-join: one ``lead`` window
    over the EVENT rows (per key, by time) gives each observation the
    half-open hour range it forward-fills, ``[ceil(us/H), ceil(next_us/H)
    - 1]`` (the last observation closes at ``floor(us/H)``); exploding
    that ``sequence`` IS the answer. Consecutive events produce contiguous
    ranges, an event superseded within the same hour produces an empty
    range, and every grid point gets exactly one value — provably the
    as-of backward fill, without materializing grid rows into a second
    shuffle: the only exchange is the event-sized window, and output rows
    are born in their final form (measured 2x faster than grid + as-of
    sweep at sf0.1, where the grid is 10x the event count). All hour
    arithmetic is exact long FLOOR/CEIL division via ``pmod`` (``div``
    alone truncates toward zero, which is wrong for pre-1970 negative
    epoch micros — ADVICE r4); results match the numpy ``//`` twin on
    either side of the epoch."""
    base = df.select(
        F.col(key).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(value_col).cast("double").alias("value"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("us")
    h = HOUR_US
    # exact integer floor/ceil division, valid for NEGATIVE micros too:
    # pmod is always non-negative, so (x - pmod(x, h)) div h == floor(x/h)
    # and (x + pmod(-x, h)) div h == ceil(x/h) for any long x
    ceil_us = f"(us + pmod(-us, {h})) div {h}"
    floor_us = f"(us - pmod(us, {h})) div {h}"
    ceil_next = f"(_next + pmod(-_next, {h})) div {h}"
    covered = (
        base.withColumn("_next", F.lead("us").over(w))
        .select(
            "user_id",
            "value",
            F.expr(ceil_us).alias("_h0"),
            F.when(
                F.col("_next").isNull(), F.expr(floor_us)
            ).otherwise(F.expr(f"{ceil_next} - 1")).alias("_h1"),
        )
        .filter(F.col("_h1") >= F.col("_h0"))
    )
    return covered.select(
        "user_id",
        F.explode(F.sequence("_h0", "_h1")).alias("hour_idx"),
        "value",
    ).select("user_id", "hour_idx", "value")


def hourly_ffill_resample_arrow(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Grouped-map (`applyInPandas`) twin of :func:`hourly_ffill_resample`
    — identical output (equivalence-tested). Prefer it when groups are few
    and large, or as the template for per-group logic native ops cannot
    express; see the module docstring for the small-group overhead
    trade-off."""
    base = df.select(
        F.col(key).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(value_col).cast("double").alias("value"),
    )
    return base.groupBy("user_id").applyInPandas(_resample_one, schema=_OUT_SCHEMA)
