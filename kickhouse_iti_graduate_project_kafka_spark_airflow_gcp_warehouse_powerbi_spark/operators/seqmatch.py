"""ClickHouse ``sequenceMatch`` with time-constraint atoms.

The plain pattern ``(?1).*(?2).*(?3)`` is covered by
``plans/dq_suite.events_sequence_match``; ClickHouse additionally
accepts gap atoms between neighboring conditions —
``(?1)(?t<=3600)(?2)`` ("signup within an hour of a view") and
``(?t>600)`` ("at least ten minutes later") — which the windowless
greedy scan cannot express: greedy earliest-first matching is complete
for unconstrained subsequences but NOT under gap bounds (the earliest
view may be too old for any signup while a later view works).

Spark-first shape: the gap-bounded existence question admits a monotone
one-pass DP, so NO backtracking automaton, NO collect_list, and NO
recursion is needed — per user, scan events in ``(ts, event_id)`` total
order and carry one number per pattern stage:

- next gap ``<= T``: keep the running MAX timestamp of stage-``i``
  completions — the latest completion is in ``[x-T, x]`` iff any is;
- next gap ``> T``: keep the running MIN — the earliest completion is
  ``< x - T`` iff any is.

Each is a strictly-preceding window aggregate, one shuffle + one
per-user sort for the whole pattern, linear in events — the same cost
model as the unconstrained ``events_sequence_match``, and the identical
SQL runs on any window-function engine, so every query built on this is
directly DuckDB-oracled (no recursive CTE). Equal-timestamp events
order by ``event_id`` (ClickHouse leaves ties unspecified; we pin a
total order so engines agree) and a zero gap satisfies ``<= T``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: gap constraint between neighboring pattern conditions: ("<=", secs)
#: or (">", secs); None = unconstrained (plain ``.*``).
GapSpec = tuple[str, float] | None


def _check(steps: tuple[str, ...], gaps: tuple[GapSpec, ...]) -> None:
    if len(set(steps)) != len(steps) or len(steps) < 2:
        raise ValueError(f"steps must be >=2 distinct event types, got {steps!r}")
    if len(gaps) != len(steps) - 1:
        raise ValueError(f"need {len(steps)-1} gap specs for {len(steps)} steps")
    for g in gaps:
        if g is not None and g[0] not in ("<=", ">"):
            raise ValueError(f"gap op must be '<=' or '>', got {g!r}")


def sequence_match_timed(
    ev: DataFrame,
    steps: tuple[str, ...],
    gaps: tuple[GapSpec, ...],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user match flag for ``(?1)(?t G1)(?2)(?t G2)...(?k)`` ->
    (user_id, matched int). Users with at least one step-typed event
    appear (the type filter pushes to the scan)."""
    _check(steps, gaps)
    k = len(steps)
    base = ev.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("double").alias("e"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).alias("event_type"),
    ).filter(F.col(type_col).isin(list(steps)))
    prev = (
        Window.partitionBy("user_id")
        .orderBy("e", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = base
    hit = F.col("event_type") == steps[0]  # stage-1 completion predicate
    for i in range(1, k):
        carry = F.max if gaps[i - 1] is None or gaps[i - 1][0] == "<=" else F.min
        df = df.withColumn(f"c{i}", carry(F.when(hit, F.col("e"))).over(prev))
        g = gaps[i - 1]
        ok = F.col(f"c{i}").isNotNull()
        if g is not None:
            op, t = g
            gap = F.col("e") - F.col(f"c{i}")
            ok = ok & (gap <= F.lit(float(t)) if op == "<=" else gap > F.lit(float(t)))
        hit = (F.col("event_type") == steps[i]) & ok
    return (
        df.withColumn("_hit", hit.cast("int"))
        .groupBy("user_id")
        .agg(F.max("_hit").alias("matched"))
    )


def sequence_match_timed_oracle_sql(
    steps: tuple[str, ...],
    gaps: tuple[GapSpec, ...],
    *,
    table: str = "events",
) -> str:
    """The SAME DP as portable window-function SQL, aggregated to the
    (n_users, n_matched) rollup the catalog queries return."""
    _check(steps, gaps)
    k = len(steps)
    quoted = ", ".join(f"'{s}'" for s in steps)
    prev = (
        "OVER (PARTITION BY user_id ORDER BY e, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    cols, hit = [], f"t = '{steps[0]}'"
    for i in range(1, k):
        carry = "MAX" if gaps[i - 1] is None or gaps[i - 1][0] == "<=" else "MIN"
        cols.append(f"{carry}(CASE WHEN {hit} THEN e END) {prev} AS c{i}")
        g = gaps[i - 1]
        ok = f"c{i} IS NOT NULL"
        if g is not None:
            op, t = g
            ok += f" AND e - c{i} {op} {float(t)}"
        hit = f"t = '{steps[i]}' AND {ok}"
    # window aggs can't nest: one CTE layer per stage
    layers = ["SELECT user_id, epoch(ts) AS e, event_id, event_type AS t"
              f" FROM {table} WHERE event_type IN ({quoted})"]
    for i, c in enumerate(cols):
        layers.append(f"SELECT *, {c} FROM s{i}")
    ctes = ",\n    ".join(f"s{i} AS ({q})" for i, q in enumerate(layers))
    return f"""
    WITH {ctes},
    per_user AS (
        SELECT user_id, MAX(CASE WHEN {hit} THEN 1 ELSE 0 END) AS matched
        FROM s{len(cols)} GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(matched) AS BIGINT) AS n_matched
    FROM per_user
    """
