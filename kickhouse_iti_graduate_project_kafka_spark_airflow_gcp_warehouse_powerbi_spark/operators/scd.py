"""SCD Type-2 dimension builds from change streams.

The reference's star schema (ClickHouse DDL 1-120) keeps dims as
latest-per-key (ReplacingMergeTree, see ``operators/latest.py``) — SCD
Type 1. The moment a dimension attribute must be queryable *as of* a
fact's instant (attribution, compliance, replays), the warehouse needs
Type 2: one row per attribute *version* with a validity interval. This
module builds that table from an append-only change/event stream, and
``operators/asof.py`` provides the scale-correct point-in-time lookup
(non-overlapping intervals per key make "state at ts" = "last
valid_from at-or-before ts", so the lookup is an as-of join — never an
interval-predicate join Spark would plan as a nested loop).

Scale shape: ONE Exchange total on the key columns. The change-flag lag
window, the running-sum run-id window (same sort), the per-run groupBy
(map-side combined, key-prefixed), and the version/lead window all reuse
that single shuffle. Per-key history never materializes as an array —
everything is streaming window + hash aggregate, so a key with millions
of changes costs one sorted scan, not memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    keys: Sequence[str],
    attr_col: str,
    ts_col: str,
    tiebreak: Sequence[str] = (),
    with_last_ts: bool = False,
) -> DataFrame:
    """Collapse an append-only change stream into SCD Type-2 versions.

    Consecutive rows (per ``keys``, ordered by ``ts_col`` then
    ``tiebreak``) with the same ``attr_col`` value form one *run*; each
    run becomes a version row:

    - ``version``     1-based per key, in validity order (bigint)
    - ``attr_col``    the run's value (column keeps its name)
    - ``valid_from``  first change timestamp of the run
    - ``valid_to``    next run's valid_from, NULL for the open run
    - ``n_events``    rows collapsed into the run
    - ``is_current``  1 for the open run else 0 (int, engine-portable)

    Rows where ``attr_col`` IS NULL participate like any other value
    (NULL-safe change comparison), matching SQL ``IS DISTINCT FROM``.

    ``with_last_ts=True`` appends a ``last_ts`` column (the run's newest
    event timestamp) — the high-watermark ``streaming/scd2.py`` uses for
    retry-idempotent incremental maintenance.
    """
    keys = list(keys)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    first_row = F.row_number().over(w) == 1
    # NULL-safe "changed" flag: eqNullSafe treats NULL==NULL as true, so
    # a NULL-valued run is one run, and value->NULL / NULL->value both
    # open a new version (IS DISTINCT FROM semantics).
    chg = F.when(first_row | ~prev.eqNullSafe(F.col(attr_col)), F.lit(1)).otherwise(
        F.lit(0)
    )
    runs = df.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.col(attr_col).alias("_attr"),
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_run_id"),
    )
    aggs = [
        F.first("_attr").alias(attr_col),
        F.min("_ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if with_last_ts:
        aggs.append(F.max("_ts").alias("last_ts"))
    versions = runs.groupBy(*keys, "_run_id").agg(*aggs)
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    cols = [
        *keys,
        F.row_number().over(w2).cast("bigint").alias("version"),
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w2).isNull().cast("int").alias("is_current"),
    ]
    if with_last_ts:
        cols.insert(len(cols) - 1, F.col("last_ts"))
    return versions.select(*cols)
