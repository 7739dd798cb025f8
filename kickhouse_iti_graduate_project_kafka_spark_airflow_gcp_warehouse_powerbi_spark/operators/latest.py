"""Latest-per-key semantics — the ReplacingMergeTree replacement.

The reference stores dims/facts in ClickHouse ReplacingMergeTree tables
(latest row per key wins by ``updated_at``, applied lazily on background
merges) and *queries* through argMax views so reads are correct regardless
of merge progress (reference: ClickHouse DDL 37/57/73/89/100/143 + hub view
DDL 447-470; README.md:475-477 'prefer views for latest semantics').

Spark-native design (SURVEY.md §3.2):
- **view-time dedup** (`latest_per_key`): one window pass over the append
  table — always correct, no compaction required. This is the gold-view
  read path.
- **write-time compaction** (`compact_latest`): periodically rewrite the
  append table keeping only the newest row per key — bounds read
  amplification exactly like ClickHouse's background merges.
- **argMax projection** (`latest_columns_max_by`): when only a few columns
  are needed, per-column max_by avoids materializing whole rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Newest row per key: row_number over (keys ordered by order_by desc).

    One shuffle on ``keys``; returns every column. ``order_by`` should end
    with a unique tiebreaker for determinism (the fixture tables use the
    entity id). Preferred over N max_by aggregates when N is large — one
    window pass instead of N aggregate expressions (SURVEY.md A5 note).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_columns_max_by(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """argMax(col, version) per key for a column subset — the literal shape
    of the reference hub view (DDL 447-470: argMax(...) GROUP BY idEvent)."""
    aggs = [F.max_by(c, version_col).alias(c) for c in value_cols]
    aggs.append(F.max(version_col).alias(f"{version_col}_latest"))
    return df.groupBy(*keys).agg(*aggs)


def compact_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Compaction job body: same dedup as latest_per_key, intended to
    overwrite the table layout periodically (ClickHouse background-merge
    analogue). Callers write the result with partitionBy + overwrite."""
    return latest_per_key(df, keys, order_by)
