"""Skew mitigation: salted aggregation and salted broadcast-replicated joins.

AQE's skew-join splitting handles most shuffle skew at runtime
(session.py enables it), but two cases still need explicit salting at
100 TB (SURVEY.md §7 step 8 'salted keys for skewed idEvent hot spots'):

- **salted_aggregate** — a groupBy on a key where a handful of values hold
  a large share of all rows (the live `idEvent` hot match). Phase 1
  aggregates on (key, salt) spreading each hot key over N reducers;
  phase 2 merges the N partials per key. Works for any algebraic
  aggregate expressed as (partial, merge) pairs.
- **salted_broadcast_left** — joining a skewed fact key against a
  dimension too big to broadcast wholesale but small enough to replicate
  N ways: the fact side gets a random salt in [0, N), the dim side is
  exploded N ways, and the join key becomes (key, salt) — no single
  reducer owns a hot key.

Salts derive from a deterministic hash of a uniqueness column when
provided (reproducible runs), else spark_partition_id — never rand(),
which breaks retry determinism (a failed task would re-roll its salts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(n_salts: int, unique_col: str | None) -> Column:
    if unique_col is not None:
        return F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    return F.pmod(F.spark_partition_id(), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1, grouped
    by keys+salt). ``merge_aggs``: name -> aggregate over the phase-1
    columns (phase 2, grouped by keys). Example for count+sum::

        salted_aggregate(df, ["k"],
            {"cnt": F.count(F.lit(1)), "total": F.sum("v")},
            {"cnt": F.sum("cnt"), "total": F.sum("total")})
    """
    salted = df.withColumn("__salt", _salt_col(n_salts, unique_col))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact against a replicated dimension.

    The dim is exploded n_salts ways (cost: n_salts x |dim| rows — use for
    dimensions that fit that budget), the fact is salted once; joining on
    (key, salt) spreads every hot key across n_salts reducers."""
    f = fact.withColumn("__salt", _salt_col(n_salts, unique_col))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")
