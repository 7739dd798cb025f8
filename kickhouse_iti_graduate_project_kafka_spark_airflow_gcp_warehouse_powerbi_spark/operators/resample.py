"""Per-key time-grid resampling with forward fill — the grouped-map
(`applyInPandas`) extension point exercised on work that is genuinely
pandas-shaped.

Regularizing an irregular event series onto a fixed grid (here: hourly,
carrying the latest observation forward) is the preprocessing step behind
feature windows, charting, and gap-tolerant aggregation. It CAN be
composed from native ops — explode an hour `sequence` per key, as-of join
back (`operators/asof.py`); a test asserts both paths agree — but the
grouped-map form is the idiomatic one: each key's series is a bounded
array, and `numpy.searchsorted` over it is one vectorized call.

Scale posture (100 TB): one shuffle on the key (the groupBy), then
Arrow-batched per-group work with zero Python-loop rows; memory per task
is one key's series + its grid (bounded by span-hours — for unbounded
spans, pre-split keys by coarse time range first). All grid arithmetic is
integer epoch-hours, so results are independent of session timezone and
engine float behavior.
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
    crosses an hour boundary produce no rows."""
    base = df.select(
        F.col(key).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(value_col).cast("double").alias("value"),
    )
    return base.groupBy("user_id").applyInPandas(_resample_one, schema=_OUT_SCHEMA)
