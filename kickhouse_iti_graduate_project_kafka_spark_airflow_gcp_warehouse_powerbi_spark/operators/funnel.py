"""ClickHouse ``windowFunnel`` with its strict modes, as one JVM-side fold.

The reference serves funnel dashboards straight from ClickHouse
(reference: clickhouse/schema.sql event-mart tables; grafana funnel
panels), whose ``windowFunnel(window, [mode])(ts, cond1..condk)`` takes
three mode flags the plain join/scan funnel in ``plans/dq_suite.py``
cannot express:

- ``strict_order``   — an event matching NO condition, seen after the
  chain has started, terminates the search ("A->B->D->C stops at D,
  level 2").
- ``strict_dedup``   — a repeat of a condition whose slot is already
  filled interrupts the search and returns that condition's level.
- ``strict_increase``— a chain step must carry a strictly larger
  timestamp than the previous step's event (equal-timestamp steps
  don't chain).

Semantics are pinned to ClickHouse's published ``getEventLevel`` scan
(AggregateFunctionWindowFunnel: one pass over the user's time-sorted
events; per level ``i`` keep the pair ``(chain_start, last_step_ts)``
of the most recent chain reaching ``i+1``; a cond-1 event restarts the
candidate chain; a cond-``i`` event extends when the previous level's
chain start is within ``window``), with ONE deliberate refinement:
ClickHouse leaves equal-timestamp processing order unspecified (its
sort is by timestamp only), while this operator totals the order with
``(ts, event_id)`` so Spark and any oracle engine walk identical
streams. The greedy keep-latest scan is exact for the declarative
"does an in-order chain within the window exist" question: a later
chain start never shrinks the window budget of a later step.

Spark-first shape: per user, ONE ``collect_list`` + ``array_sort`` +
ONE ``F.aggregate`` higher-order fold (state = k nullable
``(first, last)`` timestamp slots + a started flag + a settled
result), all whole-stage-codegen expressions — zero Python in the row
path, one shuffle. This is ClickHouse's own per-group arena cost model:
a user's events sit in one task's array. The funnel state is anchored
to absolute chain-start timestamps, so unlike the ``sequenceCount``
DFA it is NOT segment-associative — whales cannot be chunk-folded; at
100 TB a bot user bounds the task exactly as it bounds ClickHouse's
arena, and the skew-gated join/scan funnel (``events_window_funnel``)
remains the default-mode scale path.

``window_funnel_oracle_sql`` emits the SAME automaton as a DuckDB
recursive CTE (one step per (user, position)), so every mode is
directly DuckDB-oracled rather than rows-only.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_level(get) -> Column:
    """Highest level whose chain slot is set: ``get(i)`` -> f_i column."""
    out = None
    k = 0
    while True:
        try:
            get(k)
        except IndexError:
            break
        k += 1
    for lvl in range(k, 0, -1):
        cond = get(lvl - 1).isNotNull()
        out = F.when(cond, F.lit(lvl)) if out is None else out.when(cond, F.lit(lvl))
    return out.otherwise(F.lit(0))


def _funnel_step(
    steps: tuple[str, ...],
    window: float,
    strict_order: bool,
    strict_dedup: bool,
    strict_increase: bool,
):
    """One automaton transition: acc = struct(f0,l0,..,fe,res),
    x = struct(e, eid, event_type)."""
    k = len(steps)

    def step(acc, x):
        ts = x["e"]
        et = x["event_type"]
        done = acc["res"] > 0
        is_step = [et == F.lit(s) for s in steps]
        other = ~functools.reduce(_op.or_, is_step)
        slots = [acc[f"f{i}"] for i in range(k)]
        ext, dedup = {}, {}
        for i in range(1, k):
            ok = slots[i - 1].isNotNull() & (ts <= slots[i - 1] + F.lit(float(window)))
            if strict_increase:
                ok = ok & (acc[f"l{i-1}"] < ts)
            ext[i] = ok
            dedup[i] = slots[i].isNotNull() if strict_dedup else F.lit(False)
        cur_max = _max_level(lambda i: slots[i])

        fields = []
        fields.append(
            F.when(done, acc["f0"]).when(is_step[0], ts).otherwise(acc["f0"]).alias("f0")
        )
        fields.append(
            F.when(done, acc["l0"]).when(is_step[0], ts).otherwise(acc["l0"]).alias("l0")
        )
        for i in range(1, k):
            upd = is_step[i] & ~dedup[i] & ext[i]
            fields.append(
                F.when(done, acc[f"f{i}"])
                .when(upd, slots[i - 1])
                .otherwise(acc[f"f{i}"])
                .alias(f"f{i}")
            )
            fields.append(
                F.when(done, acc[f"l{i}"])
                .when(upd, ts)
                .otherwise(acc[f"l{i}"])
                .alias(f"l{i}")
            )
        fields.append(
            F.when(~done & is_step[0], F.lit(True)).otherwise(acc["fe"]).alias("fe")
        )
        res = F.when(done, acc["res"])
        if strict_order:
            res = res.when(other & acc["fe"], cur_max)
        if strict_dedup:
            for i in range(1, k):
                res = res.when(is_step[i] & dedup[i], F.lit(i + 1))
        res = res.when(is_step[k - 1] & ~dedup[k - 1] & ext[k - 1], F.lit(k))
        fields.append(res.otherwise(F.lit(0)).cast("int").alias("res"))
        return F.struct(*fields)

    return step


def window_funnel_levels(
    ev: DataFrame,
    steps: tuple[str, ...],
    window: float,
    *,
    strict_order: bool = False,
    strict_dedup: bool = False,
    strict_increase: bool = False,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Per-user ClickHouse ``windowFunnel`` level -> (user_id, funnel_level).

    ``steps`` are the condition event types (distinct, in chain order);
    ``window`` is seconds from the chain's FIRST step. Users present in
    the (mode-dependent) scanned stream appear; level 0 means no cond-1
    event. In non-``strict_order`` modes events matching no condition
    are dropped at the scan (ClickHouse skips them at insert), so the
    filter pushes to the parquet reader.

    The funnel state anchors to absolute chain-start timestamps, so
    unlike the ``sequenceCount`` DFA it is NOT segment-associative —
    a whale user's stream cannot be chunk-folded and lands in one
    task's array (ClickHouse's per-group arena has the same bound).
    ``max_events_per_key`` makes that bound LOUD: exceeding it raises
    with the offending key instead of silently straining an executor —
    the ``max_bytes_before_external_group_by`` posture.
    """
    if len(set(steps)) != len(steps) or len(steps) < 2:
        raise ValueError(f"steps must be >=2 distinct event types, got {steps!r}")
    k = len(steps)
    base = ev.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("double").alias("e"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).alias("event_type"),
    )
    if not strict_order:
        base = base.filter(F.col("event_type").isin(list(steps)))

    init_fields = []
    for i in range(k):
        init_fields.append(F.lit(None).cast("double").alias(f"f{i}"))
        init_fields.append(F.lit(None).cast("double").alias(f"l{i}"))
    init_fields.append(F.lit(False).alias("fe"))
    init_fields.append(F.lit(0).cast("int").alias("res"))

    folded = F.aggregate(
        F.col("seq"),
        F.struct(*init_fields),
        _funnel_step(steps, window, strict_order, strict_dedup, strict_increase),
    )
    seq_col = F.array_sort(F.collect_list(F.struct("e", "eid", "event_type")))
    per_user = base.groupBy("user_id").agg(seq_col.alias("seq"))
    if max_events_per_key is not None:
        per_user = per_user.withColumn(
            "seq",
            F.when(
                F.size("seq") > max_events_per_key,
                F.raise_error(
                    F.concat(
                        F.lit("window_funnel_levels: key "),
                        F.col("user_id").cast("string"),
                        F.lit(f" exceeds max_events_per_key={max_events_per_key} ("),
                        F.size("seq").cast("string"),
                        F.lit(" events) - route whales out or raise the bound"),
                    )
                ),
            ).otherwise(F.col("seq")),
        )
    per_user = per_user.select("user_id", folded.alias("st"))

    def _slot(i: int) -> Column:
        if i >= k:
            raise IndexError(i)
        return F.col("st")[f"f{i}"]

    level = F.when(F.col("st")["res"] > 0, F.col("st")["res"]).otherwise(
        _max_level(_slot)
    )
    return per_user.select("user_id", level.cast("int").alias("funnel_level"))


def window_funnel_oracle_sql(
    steps: tuple[str, ...],
    window: float,
    *,
    strict_order: bool = False,
    strict_dedup: bool = False,
    strict_increase: bool = False,
    table: str = "events",
) -> str:
    """The SAME automaton as a DuckDB recursive CTE, aggregated to the
    (funnel_level, n_users) distribution — the catalog oracle for every
    mode. One recursion step per (user, position); positions are the
    ``(ts, event_id)`` total order the Spark fold uses."""
    k = len(steps)
    quoted = ", ".join(f"'{s}'" for s in steps)
    where = "" if strict_order else f"WHERE event_type IN ({quoted})"
    init_cols = ",\n           ".join(
        f"CAST(NULL AS DOUBLE) AS f{i}, CAST(NULL AS DOUBLE) AS l{i}" for i in range(k)
    )
    w = float(window)

    def ext(i: int) -> str:
        inc = f" AND s.l{i-1} < e.x" if strict_increase else ""
        return f"(s.f{i-1} IS NOT NULL AND e.x <= s.f{i-1} + {w}{inc})"

    def dedup(i: int) -> str:
        return f"s.f{i} IS NOT NULL" if strict_dedup else "FALSE"

    step_cols = [
        f"CASE WHEN s.res > 0 THEN s.f0 WHEN e.t = '{steps[0]}' THEN e.x ELSE s.f0 END AS f0",
        f"CASE WHEN s.res > 0 THEN s.l0 WHEN e.t = '{steps[0]}' THEN e.x ELSE s.l0 END AS l0",
    ]
    for i in range(1, k):
        upd = f"e.t = '{steps[i]}' AND NOT ({dedup(i)}) AND {ext(i)}"
        step_cols.append(
            f"CASE WHEN s.res > 0 THEN s.f{i} WHEN {upd} THEN s.f{i-1} ELSE s.f{i} END AS f{i}"
        )
        step_cols.append(
            f"CASE WHEN s.res > 0 THEN s.l{i} WHEN {upd} THEN e.x ELSE s.l{i} END AS l{i}"
        )
    step_cols.append(
        f"CASE WHEN s.res > 0 THEN s.fe WHEN e.t = '{steps[0]}' THEN TRUE ELSE s.fe END AS fe"
    )
    cur_max = "CASE " + " ".join(
        f"WHEN s.f{i} IS NOT NULL THEN {i+1}" for i in range(k - 1, -1, -1)
    ) + " ELSE 0 END"
    res_branches = ["WHEN s.res > 0 THEN s.res"]
    if strict_order:
        res_branches.append(f"WHEN e.t NOT IN ({quoted}) AND s.fe THEN ({cur_max})")
    if strict_dedup:
        for i in range(1, k):
            res_branches.append(f"WHEN e.t = '{steps[i]}' AND {dedup(i)} THEN {i+1}")
    res_branches.append(
        f"WHEN e.t = '{steps[k-1]}' AND NOT ({dedup(k-1)}) AND {ext(k-1)} THEN {k}"
    )
    step_cols.append("CASE " + " ".join(res_branches) + " ELSE 0 END AS res")
    step_sql = ",\n           ".join(step_cols)
    final_max = "CASE " + " ".join(
        f"WHEN f{i} IS NOT NULL THEN {i+1}" for i in range(k - 1, -1, -1)
    ) + " ELSE 0 END"
    return f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, epoch(ts) AS x, event_type AS t,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
               COUNT(*)    OVER (PARTITION BY user_id) AS n
        FROM {table}
        {where}
    ),
    st AS (
        SELECT user_id, n, 0 AS pos,
           {init_cols},
           FALSE AS fe, 0 AS res
        FROM (SELECT DISTINCT user_id, n FROM ev)
        UNION ALL
        SELECT s.user_id, s.n, s.pos + 1,
           {step_sql}
        FROM st s JOIN ev e ON e.user_id = s.user_id AND e.pos = s.pos + 1
        WHERE s.pos < s.n
    ),
    lvl AS (
        SELECT user_id,
               CASE WHEN res > 0 THEN res ELSE {final_max} END AS funnel_level
        FROM st WHERE pos = n
    )
    SELECT CAST(funnel_level AS INT) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lvl GROUP BY funnel_level
    """
