"""Rolling distinct counts — the non-associative window ClickHouse's
``uniqExact`` cannot roll.

BI's "N-day active users" series needs, for every period p, the exact
distinct count of keys seen in ``[p - window + 1, p]``.  Distinct is not
an associative aggregate, so no window frame composes it from per-period
states; ClickHouse answers with per-query scans, Spark has no builtin.

The distributed spelling here is the COVERING-WINDOW EXPLODE:

1. reduce the fact to DISTINCT (period, key) pairs — the only full
   pass, and the reduction everything after is bounded by;
2. explode each pair into the ``window`` period-ends it contributes to
   (constant fan-out = window length);
3. one countDistinct per period-end.

Cost is ``window x |distinct period-key pairs|`` — independent of raw
event volume, which is what lets the same plan roll 100 TB of events
whose distinct (day, user) reduction is merely billions of rows.  For
very long windows (window >> 32) the fan-out cost grows linearly and an
HLL-state merge (associative, approximate) becomes the better trade —
``sources/parts.py``'s ``hll`` agg_spec is that path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rolling_distinct(
    df: DataFrame,
    period: Column,
    key: Column,
    window: int,
    out_period: str = "period",
    out_count: str = "rolling_uniques",
) -> DataFrame:
    """Exact rolling distinct ``key`` count over the trailing ``window``
    periods, for every period between the observed min and max.

    ``period`` must be an integral Column (epoch-day / epoch-hour /
    month index — integer bucketing keeps it session-timezone-proof);
    ``window`` is the trailing length in periods (``1`` = plain per-
    period distinct).  Period-ends near the start of the observed span
    have a partial lookback, the standard rolling-series convention.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    pairs = df.select(period.alias("_p"), key.alias("_k")).distinct()
    span = pairs.agg(F.min("_p").alias("_p0"), F.max("_p").alias("_p1"))
    cover = pairs.select(
        "_k",
        F.explode(F.sequence(F.col("_p"), F.col("_p") + (window - 1))).alias(
            "_w"
        ),
    )
    return (
        cover.crossJoin(F.broadcast(span))
        .where(F.col("_w").between(F.col("_p0"), F.col("_p1")))
        .groupBy(F.col("_w").alias(out_period))
        .agg(F.countDistinct("_k").alias(out_count))
    )
