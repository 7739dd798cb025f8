"""Table snapshot diff — the reconciliation primitive behind warehouse
audits ("what changed between yesterday's gold and today's?").

``table_diff`` classifies every key as added / removed / changed /
unchanged via ONE full-outer join on the key columns, with per-column
null-safe equality flags so a summary can say WHICH columns drifted.
No hashes cross engines (cross-engine hash parity is a trap — the
SURVEY's hash-parity rule): comparisons are plain ``<=>`` per column,
so an external system (or the DuckDB oracle) reproduces the
classification exactly.

Scale posture (two 100 TB snapshots): one co-keyed shuffle per side —
the same cost as any fact-to-fact join, AQE-handled; the per-column
flags are narrow projections; the summary is a tiny aggregate. If both
snapshots share a bucketed layout (sources/bucketed.py) the join is
exchange-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of snapshot ``b`` against snapshot ``a``.

    Returns one row per key present in either side:
    (keys..., status, diff_<col> boolean per compare col) where status ∈
    added (b only) / removed (a only) / changed (both, any column
    differs under null-safe equality) / unchanged."""
    pa = a.select(
        *keys,
        F.lit(1).alias("_in_a"),
        *[F.col(c).alias(f"_a_{c}") for c in compare_cols],
    )
    pb = b.select(
        *keys,
        F.lit(1).alias("_in_b"),
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
    )
    j = pa.join(pb, list(keys), "full_outer")
    diffs = [
        (~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))).alias(f"diff_{c}")
        for c in compare_cols
    ]
    any_diff = None
    for c in compare_cols:
        d = ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    status = (
        F.when(F.col("_in_a").isNull(), "added")
        .when(F.col("_in_b").isNull(), "removed")
        .when(any_diff, "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("status"), *diffs)


def diff_summary(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Aggregate of :func:`table_diff`: (status, n_rows, n_diff_<col>...).
    Column-diff counts are 0 for added/removed rows (there is nothing to
    compare) — they attribute drift among CHANGED rows only."""
    d = table_diff(a, b, keys, compare_cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(
            F.when((F.col("status") == "changed") & F.col(f"diff_{c}"), 1).otherwise(0)
        ).alias(f"n_diff_{c}")
        for c in compare_cols
    ]
    return d.groupBy("status").agg(*aggs)
