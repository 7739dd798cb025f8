"""ClickHouse ``retention(cond1, …, condN)`` as a reusable operator.

The reference stack surfaces cohort retention through ClickHouse's
``retention`` aggregate (ClickHouse SQL reference; the kickhouse Grafana
dashboards chart exactly this rollup shape over the events stream). The
documented semantics: per group, an array of flags where ``r1`` = cond1
ever held and ``r_i`` (i > 1) = cond1 AND cond_i both held — conditions
are arbitrary boolean predicates with NO ordering requirement between
them (unlike ``windowFunnel``/``sequenceMatch``).

Spark-first shape: one key-partitioned conditional aggregation
(``max(cond::int)`` per condition — map-side partial combine does the
heavy lifting), then the cond1 gating as plain column arithmetic on the
N-flag result. One exchange on the group keys, no window, no join;
scales as a single fact pass at any key count. The r10-oracled
``events_retention`` catalog query is this operator plus a one-row sum
rollup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention(
    df: DataFrame,
    conds: Sequence[Column],
    key_cols: Sequence[str] = ("user_id",),
    out_prefix: str = "r",
) -> DataFrame:
    """Per-``key_cols`` ClickHouse ``retention`` flags: columns
    ``{out_prefix}1 … {out_prefix}N`` (int 0/1), where flag 1 is "cond1
    ever held for this key" and flag ``i`` is "cond1 AND cond_i both
    ever held" (the documented gating — a key outside the cohort
    contributes 0 to every retained bucket even when cond_i held).

    ``conds`` are row-level boolean Columns over ``df``; at least one is
    required (it defines the cohort). Rollups compose on top::

        flags = retention(events, [d == d0, purchased_d1, purchased_d7])
        flags.agg(F.sum("r1"), F.sum("r2"), F.sum("r3"))

    because gating already happened per key, plain sums ARE the
    ClickHouse ``sum(r[i])`` rollup.
    """
    if not conds:
        raise ValueError("retention needs at least one condition (the cohort)")
    per_key = df.groupBy(*key_cols).agg(
        *[
            F.max(c.cast("int")).alias(f"_rc{i + 1}")
            for i, c in enumerate(conds)
        ]
    )
    flags = [F.col("_rc1").alias(f"{out_prefix}1")]
    flags += [
        (F.col("_rc1") * F.col(f"_rc{i}")).alias(f"{out_prefix}{i}")
        for i in range(2, len(conds) + 1)
    ]
    return per_key.select(*key_cols, *flags)
