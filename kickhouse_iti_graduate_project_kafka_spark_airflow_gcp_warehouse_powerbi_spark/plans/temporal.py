"""Temporal enrichment plans: as-of joins over the event stream.

The reference solves its only "latest state" need with argMax views
(SURVEY.md §2.4 note: no theta/range/as-of joins exist there), but the
ClickHouse engine it targets ships ``ASOF JOIN`` and event-pipeline users
reach for it constantly — conversion attribution, sensor calibration,
snapshot-as-of-fact joins. These queries make the engine's as-of operator
(`operators/asof.py` — union-tag sweep, one shuffle, no range blow-up)
driver-checkable against DuckDB's native ``ASOF JOIN``.

Determinism: engines leave ASOF's equal-timestamp corner unspecified, and
the r11 SKEWED sweep proved it bites — reassigning 10% of events to one
whale user creates thousands of duplicate (user_id, ts) right rows (the
10-copy fixture reuses sf0.1 timestamps), and the engine and DuckDB
silently picked different winners. Every as-of query therefore pins a
TOTAL order: the engine passes ``tiebreak="event_id"`` (highest id wins
backward, lowest wins forward — operators/asof.py contract) and each
oracle pre-collapses the right side to one row per (user_id, ts) with the
same MAX/MIN(event_id) rule, which keeps DuckDB's native ASOF exact while
staying O(n log n). Gaps are exact integer microseconds on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.asof import asof_join, asof_join_bucketed
from ..operators.range_join import range_join
from ..operators.scd import scd2_collapse
from ..sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


#: user_hourly_resample_ffill materializes a users × hours grid on BOTH
#: engines; the DuckDB oracle's grid peaked ~70 GB at sf10 (r11 sweep
#: needed a dedicated worker).  Above this user count the query bounds
#: itself to a deterministic md5 user sample whose expected size is this
#: cap — 15 000 is exactly the sf1 user count, so sf1 and below stay
#: byte-identical to the ungated query and larger fixtures resample an
#: sf1-scale grid (the engine side scales fine either way; the gate
#: exists so the ORACLE fits in default parallel sweep workers).
RESAMPLE_GATE_MAX_USERS = 15_000
_GATE_BUCKETS = 1_000_000


def _resample_gated_events(ev: DataFrame) -> DataFrame:
    """Deterministically bound the resample input by user: pass-through
    at or below the cap, md5 per-million bucket sample above it —
    integer arithmetic both engines reproduce exactly (the brute-force
    embedding legs' gate, keyed on user_id)."""
    from .curation import sample_bucket

    n = ev.select("user_id").distinct().count()
    if n <= RESAMPLE_GATE_MAX_USERS:
        return ev
    keep = (_GATE_BUCKETS * RESAMPLE_GATE_MAX_USERS) // n
    return ev.filter(
        sample_bucket(F.col("user_id"), _GATE_BUCKETS) < keep
    )


#: DuckDB spelling of the same gate (prepend inside WITH; read FROM ge)
_RESAMPLE_GATE_SQL = f"""
    nu AS (SELECT COUNT(DISTINCT user_id) AS c FROM events),
    ge AS (
        SELECT e.* FROM events e, nu
        WHERE nu.c <= {RESAMPLE_GATE_MAX_USERS}
           OR CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % {_GATE_BUCKETS}
              < ({_GATE_BUCKETS}::BIGINT * {RESAMPLE_GATE_MAX_USERS}) // nu.c
    )"""


@register(
    "purchase_attribution_asof",
    bench=True,
    tags=("asof", "join", "events"),
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), v AS (
        -- tie contract: highest event_id wins an equal-(user, ts) group;
        -- collapsing to that winner FIRST keeps native ASOF deterministic
        SELECT user_id, ts, MAX(event_id) AS event_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           p.ts AS purchase_ts,
           v.event_id AS view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_micros
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: attribute every purchase to the user's latest view
    at-or-before the purchase instant (classic last-touch attribution).
    Purchases with no prior view keep NULLs — ASOF LEFT JOIN semantics.
    The oracle is DuckDB's native ASOF JOIN, so this row proves the
    union-tag sweep reproduces the engine-standard semantics exactly."""
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        p, v, on=["user_id"], left_ts="ts", right_ts="ts", tiebreak="event_id"
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("r_event_id").alias("view_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))).alias(
            "gap_micros"
        ),
    )


@register(
    "purchase_attribution_asof_bucketed",
    bench=True,
    tags=("asof", "join", "events", "skew"),
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), v AS (
        -- same tie contract as purchase_attribution_asof
        SELECT user_id, ts, MAX(event_id) AS event_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           p.ts AS purchase_ts,
           v.event_id AS view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_micros
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def purchase_attribution_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same attribution as ``purchase_attribution_asof``, through the
    range-bucketed sweep (operators/asof.asof_join_bucketed) with 6-hour
    buckets — the hot-key mitigation. Sharing the plain query's DuckDB
    ASOF-JOIN oracle makes the driver row a machine-checked proof that the
    bucketed plan is result-identical while a single celebrity key spreads
    over time_span/6h tasks instead of serializing into one."""
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join_bucketed(
        p, v, on=["user_id"], left_ts="ts", right_ts="ts",
        bucket_micros=6 * 3_600_000_000, tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("r_event_id").alias("view_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))).alias(
            "gap_micros"
        ),
    )


@register(
    "purchase_next_error_asof",
    tags=("asof", "join", "events"),
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), e AS (
        -- forward mirror of the tie contract: LOWEST event_id wins
        SELECT user_id, ts, MIN(event_id) AS event_id
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id AS purchase_id,
           e.event_id AS error_id,
           epoch_us(e.ts) - epoch_us(p.ts) AS gap_micros
    FROM p ASOF LEFT JOIN e
      ON p.user_id = e.user_id AND e.ts >= p.ts
    """,
)
def purchase_next_error_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: the user's first error at-or-after each purchase
    (did the purchase flow break next?). Exercises the reversed sweep
    order; oracle is DuckDB ASOF with the >= inequality."""
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        p, e, on=["user_id"], left_ts="ts", right_ts="ts",
        direction="forward", tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("error_id"),
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("ts"))).alias(
            "gap_micros"
        ),
    )


@register(
    "purchases_after_error_rangejoin",
    bench=True,
    tags=("rangejoin", "join", "events"),
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), e AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id AS purchase_id,
           e.event_id AS error_id,
           epoch_us(p.ts) - epoch_us(e.ts) AS gap_micros
    FROM p JOIN e
      ON p.user_id = e.user_id
     AND p.ts >= e.ts
     AND epoch_us(p.ts) - epoch_us(e.ts) <= 21600000000
    """,
)
def purchases_after_error_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval multi-match: every purchase paired with EVERY
    error episode ([error_ts, error_ts + 6h]) of the same user containing
    it (operators/range_join.py — bin-bucketed, bin = max interval length,
    so intervals replicate to at most 2 bins and no per-key cross product
    ever forms). The oracle is the plain inequality join DuckDB can afford
    at this scale; the engine plan stays an equi-join on (user_id, bin)."""
    six_h_us = 6 * 3600 * 1_000_000
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("err_start"),
        F.timestamp_micros(F.unix_micros("ts") + six_h_us).alias("err_end"),
    )
    out = range_join(
        p, e, on=["user_id"], point_col="ts",
        start_col="err_start", end_col="err_end",
        bin_width_micros=six_h_us,
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("i_error_id").alias("error_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("i_err_start"))).alias(
            "gap_micros"
        ),
    )


@register(
    "user_hourly_resample_ffill",
    bench=True,
    tags=("resample", "UDF", "asof", "events"),
    oracle=f"""
    WITH {_RESAMPLE_GATE_SQL},
    b AS (
        SELECT user_id, epoch_us(ts) AS us, value FROM ge
    ), spans AS (
        SELECT user_id,
               (MIN(us) + 3599999999) // 3600000000 AS h0,
               MAX(us) // 3600000000 AS h1
        FROM b GROUP BY user_id
    ), grid AS (
        SELECT user_id, UNNEST(range(h0, h1 + 1)) AS hour_idx
        FROM spans WHERE h1 >= h0
    ), pts AS (
        SELECT user_id, hour_idx, hour_idx * 3600000000 AS gus FROM grid
    )
    SELECT p.user_id, p.hour_idx, e.value
    FROM pts p ASOF JOIN b e
      ON p.user_id = e.user_id AND e.us <= p.gus
    """,
)
def user_hourly_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's event series regularized onto an hourly grid with
    forward fill (operators/resample.py): per-key span aggregate -> hour
    ``sequence`` explode -> as-of union-tag sweep, whole-stage codegen
    end to end (integer epoch-hour grid so no timezone or float behavior
    crosses engines). The grouped-map ``applyInPandas`` twin
    (hourly_ffill_resample_arrow) is equivalence-tested in pytest — the
    native form is primary because thousands of small per-user groups pay
    ~2 ms of per-group pandas overhead each (10.5 s -> ~1.5 s at sf0.1).
    The oracle rebuilds the grid with range() and fills via DuckDB's
    native ASOF JOIN. Values are carried, never computed, so doubles are
    bitwise-stable.  Above RESAMPLE_GATE_MAX_USERS the input is bounded
    by the deterministic md5 user gate on both engines — the oracle's
    users×hours grid peaked ~70 GB at sf10 without it."""
    from ..operators.resample import hourly_ffill_resample

    return hourly_ffill_resample(
        _resample_gated_events(_events(spark, sf_dir)),
        key="user_id",
        ts_col="ts",
        value_col="value",
    )


@register(
    "user_state_scd2",
    bench=True,
    tags=("scd2", "warehouse", "window", "events"),
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
        SELECT user_id, ts, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM e
    ), v AS (
        SELECT user_id, run_id, event_type AS state, MIN(ts) AS valid_from,
               COUNT(*) AS n_events
        FROM r GROUP BY user_id, run_id, event_type
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
           state,
           valid_from,
           LEAD(valid_from) OVER w2 AS valid_to,
           n_events,
           CAST(LEAD(valid_from) OVER w2 IS NULL AS INT) AS is_current
    FROM v
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
    """,
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse each user's event stream into
    change-runs of event_type and emit one versioned row per run with
    [valid_from, valid_to) validity, open-ended for the current state —
    the slowly-changing-dimension machinery a star-schema warehouse (the
    reference's dim_* tables, DDL 1-120) needs the moment a dimension
    attribute starts changing over time.

    Scale shape (operators/scd.py): a single shuffle on user_id feeds the
    change-flag lag, the running-sum run id (same window sort, exchange
    reused), the per-run groupBy (map-side combined, same key prefix),
    and the version/lead window. Per-user state never materializes as an
    array; everything is streaming window + hash-agg."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_collapse(
        ev, keys=["user_id"], attr_col="event_type", ts_col="ts",
        tiebreak=["event_id"],
    ).withColumnRenamed("event_type", "state")


@register(
    "purchase_state_point_in_time",
    tags=("scd2", "asof", "join", "events"),
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
        SELECT user_id, ts, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM e
    ), dim AS (
        SELECT user_id, run_id, event_type AS state, MIN(ts) AS valid_from
        FROM r GROUP BY user_id, run_id, event_type
    ), p AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           dim.state AS state_at_purchase,
           CAST(dim.state = 'purchase' AS INT) AS self_consistent
    FROM p ASOF JOIN dim
      ON p.user_id = dim.user_id AND dim.valid_from <= p.ts
    """,
)
def purchase_state_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 dim built by
    user_state_scd2: the state valid at each purchase instant. Because
    SCD2 intervals are non-overlapping per key, state-at-time is exactly
    "last valid_from at-or-before ts" — so the lookup is the as-of
    operator (one shuffle), NEVER an interval-predicate join that Spark
    would plan as a nested loop. self_consistent must be 1 on every row
    (a purchase instant lies inside a 'purchase' run by construction);
    the driver-checked column makes the SCD2/as-of composition
    self-proving at any SF."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_collapse(
        ev, keys=["user_id"], attr_col="event_type", ts_col="ts",
        tiebreak=["event_id"],
    ).withColumnRenamed("event_type", "state")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(p, dim.select("user_id", "state", "valid_from"),
                    on=["user_id"], left_ts="ts", right_ts="valid_from")
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("r_state").alias("state_at_purchase"),
        (F.col("r_state") == F.lit("purchase")).cast("int").alias("self_consistent"),
    )
