"""Interval-concurrency aggregates — ClickHouse ``maxIntersections`` /
``maxIntersectionsPosition`` as a partition-parallel sweep.

Each closed integer interval ``[s, e]`` contributes a +1 entry at ``s``
and a -1 exit at ``e + 1``; a per-key running sum over the
``(coordinate, kind)`` order — exits processed BEFORE entries at equal
coordinates, so intervals touching end-to-start never double count —
peaks exactly at the maximum concurrency, and ``max(struct(rs, -coord))``
reads off the peak and its FIRST coordinate in one aggregation. Within
an equal ``(coordinate, kind)`` run all deltas share a sign, so the
running sum's attained values are order-invariant: no per-row tiebreak
is needed for cross-engine determinism.

One explode (2n rows), one shuffle on the key, one sort — at 100 TB the
sweep stays fully parallel because intervals never cross keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def max_intersections(
    df: DataFrame,
    key_col: str,
    start: Column,
    end: Column,
) -> DataFrame:
    """(key, max_overlap int, first_peak_pos long) per key.

    ``start``/``end`` are integer-coordinate columns of a CLOSED
    interval [start, end]; rows with end < start are invalid and raise
    at execution (a loud guard beats silently negative sweeps).
    """
    guard = F.when(
        end < start,
        F.raise_error(
            F.concat(
                F.lit("max_intersections: interval end < start for key "),
                F.col(key_col).cast("string"),
            )
        ),
    ).otherwise(end)
    ev = df.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                F.struct(
                    (guard + 1).cast("long").alias("d"),
                    F.lit(0).alias("k"),
                    F.lit(-1).alias("delta"),
                ),
                F.struct(
                    start.cast("long").alias("d"),
                    F.lit(1).alias("k"),
                    F.lit(1).alias("delta"),
                ),
            )
        ).alias("x"),
    ).select("key", "x.*")
    w = (
        Window.partitionBy("key")
        .orderBy("d", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = ev.withColumn("rs", F.sum("delta").over(w))
    best = scored.groupBy("key").agg(
        F.max(F.struct(F.col("rs").alias("m"), (-F.col("d")).alias("nd"))).alias("b")
    )
    return best.select(
        F.col("key"),
        F.col("b.m").cast("int").alias("max_overlap"),
        (-F.col("b.nd")).cast("long").alias("first_peak_pos"),
    )


def interval_length_sum(
    df: DataFrame,
    key_col: str,
    start: Column,
    end: Column,
) -> DataFrame:
    """ClickHouse ``intervalLengthSum`` -> (key, covered long): total
    length of the UNION of half-open integer intervals [start, end) per
    key — overlap merged, gaps excluded (``maxIntersections``'s
    complement: how much of the axis is covered at all).

    Sweep with NO tie ordering to pin: deltas collapse per (key,
    coordinate) first (one groupBy), so the running active count is a
    pure function of the coordinate; each segment [d, next_d) counts
    when the active count after d is positive. Empty intervals
    (end == start) contribute 0; end < start raises loudly.
    """
    guard = F.when(
        end < start,
        F.raise_error(
            F.concat(
                F.lit("interval_length_sum: interval end < start for key "),
                F.col(key_col).cast("string"),
            )
        ),
    ).otherwise(end)
    ev = df.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                F.struct(start.cast("long").alias("d"), F.lit(1).alias("delta")),
                F.struct(guard.cast("long").alias("d"), F.lit(-1).alias("delta")),
            )
        ).alias("x"),
    ).select("key", "x.*")
    per_coord = ev.groupBy("key", "d").agg(F.sum("delta").alias("delta"))
    w = Window.partitionBy("key").orderBy("d")
    scored = per_coord.withColumn(
        "active", F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("next_d", F.lead("d").over(w))
    return (
        scored.groupBy("key")
        .agg(
            F.sum(
                F.when(
                    (F.col("active") > 0) & F.col("next_d").isNotNull(),
                    F.col("next_d") - F.col("d"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("covered")
        )
    )
