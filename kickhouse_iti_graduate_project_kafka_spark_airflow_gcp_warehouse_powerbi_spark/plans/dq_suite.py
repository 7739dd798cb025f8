"""Data-quality OLAP suite over the `events` stream table.

Re-expresses the reference's rejected-lake analytics — the 12-query DuckDB
notebook + Grafana dashboards (reference: airflow/dags/duckDB/
duckdb_olap.ipynb cell 2; grafana/dashboards/daily_dashboard_for_invalid_
data-*.json; airflow/document.md:29-59) — as Spark DataFrame plans over the
fixture `events` table (event_id, ts, user_id, event_type, value, props-JSON).

The 'error' event_type plays the role of an invalid message; `props` plays
the raw-JSON `message` column probed with JSON path ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.expressions import decimal_avg
from ..sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


#: WITH FILL guard: the widest dense grid one series may span (~11 years
#: of hours). ClickHouse bounds WITH FILL materialization the same way
#: (fill step limits); one corrupt 1970-epoch row must fail LOUDLY, not
#: silently fan a ~490k-row grid per event type. Pipeline inputs pass
#: through the ST4 timestamp repair so this never fires on the curated
#: path — the guard protects the operator registered standalone.
MAX_FILL_HOURS = 100_000


def _guarded_span_start(h0: str, h1: str):
    """``h0`` column, or a loud error when the [h0, h1] span exceeds
    MAX_FILL_HOURS — evaluated inside the plan (no extra action), so the
    sequence() explode can never materialize an unbounded grid."""
    msg = F.concat(
        F.lit(f"WITH FILL span exceeds {MAX_FILL_HOURS} hours for event_type "),
        F.col("event_type"),
        F.lit(": ["),
        F.col(h0).cast("string"),
        F.lit(", "),
        F.col(h1).cast("string"),
        F.lit("] - outlier timestamp? route input through timestamp repair (ST4)"),
    )
    return (
        F.when(F.col(h1) - F.col(h0) > MAX_FILL_HOURS, F.raise_error(msg))
        .otherwise(F.col(h0))
        .cast("long")
    )


# ---- query_1 shape: messages per topic (A1) -------------------------------
@register(
    "events_per_type",
    tags=("A1",),
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts per type (reference: notebook query_1 'invalid messages per
    topic')."""
    return _events(spark, sf_dir).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ---- query_2 shape: hourly time-bucketed counts (A2) ----------------------
@register(
    "events_hourly_counts",
    bench=True,
    tags=("A2",),
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly ingest curve (reference: notebook query_2 GROUP BY
    STRFTIME/DATE_TRUNC hour). In streaming mode the same plan is
    groupBy(window(ts, '1 hour')) — see streaming/validate.py."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---- query_3/6 shape: conditional aggregation + ratio (A3, A8) ------------
@register(
    "error_ratio_by_hour",
    tags=("A3", "A8", "A2"),
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour,
           COUNT(*) AS total,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) * 100.0
                 / COUNT(*) AS error_pct
    FROM events GROUP BY 1
    """,
)
def error_ratio_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation + ratio-of-aggregates (reference: notebook
    query_3 keyword classes, query_6 invalid ratio)."""
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(is_err).alias("n_error"),
            (F.sum(is_err) * 100.0 / F.count(F.lit(1))).alias("error_pct"),
        )
    )


# ---- query_4 shape: AVG(LENGTH(message)) (A4) -----------------------------
@register(
    "avg_payload_len_by_type_day",
    tags=("A4", "A2"),
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(LENGTH(props)) AS BIGINT) * 1.0 / COUNT(*) AS avg_len,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def avg_payload_len_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG(LENGTH(payload)) per (type, day) (reference: notebook query_4).
    Day buckets use integer epoch-day arithmetic, not to_date(ts):
    to_date truncates the instant in the SESSION timezone, so a non-UTC
    driver regroups midnight-adjacent events to the wrong day (caught by
    the r9 full non-UTC oracle sweep — the one red row in 180)."""
    day = F.date_from_unix_date(
        F.floor(F.col("ts").cast("double") / 86400).cast("int")
    ).alias("day")
    return (
        _events(spark, sf_dir)
        .groupBy("event_type", day)
        .agg(
            (F.sum(F.length("props")).cast("long") * 1.0 / F.count(F.lit(1))).alias("avg_len"),
            decimal_avg("value", 2, 14).alias("avg_value"),
        )
    )


# ---- query_5 shape: aggregate-to-aggregate LEFT JOIN ratio (J4) -----------
@register(
    "high_value_ratio_by_type",
    tags=("J4", "A8"),
    oracle="""
    WITH total AS (
        SELECT event_type, COUNT(*) AS total_cnt FROM events GROUP BY 1
    ), high AS (
        SELECT event_type, COUNT(*) AS high_cnt FROM events
        WHERE value > 30.0 GROUP BY 1
    )
    SELECT t.event_type AS event_type, t.total_cnt AS total_cnt,
           COALESCE(h.high_cnt, 0) AS high_cnt,
           COALESCE(h.high_cnt, 0) * 100.0 / t.total_cnt AS high_pct
    FROM total t LEFT JOIN high h ON t.event_type = h.event_type
    """,
)
def high_value_ratio_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two grouped frames joined LEFT with COALESCE(cnt,0) ratio (reference:
    notebook query_5 CTE total_msgs LEFT JOIN invalid_msgs). Both sides
    aggregate before the join, so the join input is tiny regardless of scale."""
    ev = _events(spark, sf_dir)
    total = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("total_cnt"))
    high = (
        ev.filter(F.col("value") > 30.0)
        .groupBy(F.col("event_type").alias("h_type"))
        .agg(F.count(F.lit(1)).alias("high_cnt_raw"))
    )
    return (
        total.join(F.broadcast(high), total.event_type == high.h_type, "left")
        .select(
            "event_type",
            "total_cnt",
            F.coalesce("high_cnt_raw", F.lit(0)).alias("high_cnt"),
            (F.coalesce("high_cnt_raw", F.lit(0)) * 100.0 / F.col("total_cnt")).alias("high_pct"),
        )
    )


# ---- query_7 shape: top-K frequent values (A9) ----------------------------
@register(
    "top_users_by_events",
    tags=("A9", "O2"),
    oracle="""
    SELECT user_id, COUNT(*) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id ASC LIMIT 10
    """,
)
def top_users_by_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 noisiest keys (reference: notebook query_7). Total-order sort
    (n desc, user_id asc) keeps the LIMIT deterministic under ties."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
    )


# ---- query_10 shape: moving average over hourly ratio (WF1) ---------------
@register(
    "moving_avg_error_pct",
    bench=True,
    tags=("WF1", "A3", "A8"),
    oracle="""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
               CAST(SUM(CASE WHEN value > 30.0 THEN 1 ELSE 0 END) AS BIGINT)
                   * 100.0 / COUNT(*) AS high_pct
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, high_pct,
           ROUND(AVG(high_pct) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS smoothed_pct
    FROM hourly
    """,
)
def moving_avg_error_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-bucket moving average of an hourly ratio (reference: notebook
    query_10 — AVG(pct) OVER (PARTITION BY topic ORDER BY hour ROWS BETWEEN
    5 PRECEDING AND CURRENT ROW)).

    The hourly pct is a single IEEE division of exact integers (bitwise
    deterministic); the sliding average of *doubles* is engine-order
    dependent at ~1e-13, so it is rounded at 4dp with a +1e-9 nudge that
    moves both engines off any exact decimal half-boundary."""
    high = F.when(F.col("value") > 30.0, 1).otherwise(0)
    hourly = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg((F.sum(high) * 100.0 / F.count(F.lit(1))).alias("high_pct"))
    )
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-5, 0)
    return hourly.select(
        "event_type",
        "hour",
        "high_pct",
        F.round(F.avg("high_pct").over(w) + 1e-9, 4).alias("smoothed_pct"),
    )


# ---- JSON path extraction over raw payloads (grafana shape) ---------------
@register(
    "json_payload_buckets",
    tags=("P3", "JSON"),
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def json_payload_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc JSON path probing of a raw payload column (reference: grafana
    `message ->> 'strSport'`; airflow/document.md:38-50). get_json_object
    stays JVM-side — no Python in the hot path."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        _events(spark, sf_dir)
        .filter(k.isNotNull())
        .groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), decimal_avg("value", 2, 14).alias("avg_value"))
    )


# ---- sessionization (gap-based) — ST10 extension --------------------------
@register(
    "user_sessions_30min",
    bench=True,
    tags=("ST10", "WF2", "extension"),
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def user_sessions_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + cumulative
    flag — the batch analogue of Structured Streaming's session_window
    (SURVEY.md §2.9 ST10). One window shuffle on user_id. The streaming
    ``F.session_window`` twin is driven under a real watermarked query
    (cross-batch merge + watermark close) and asserted equal to this
    shape in tests/test_streaming_windows.py."""
    w = Window.partitionBy("user_id").orderBy("ts")
    lag_ts = F.lag("ts").over(w)
    new_session = F.when(
        lag_ts.isNull() | (F.col("ts").cast("double") - lag_ts.cast("double") > 1800.0), 1
    ).otherwise(0)
    return (
        _events(spark, sf_dir)
        .withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "events_per_type_salted",
    tags=("A1", "skew"),
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high
    FROM events GROUP BY event_type
    """,
)
def events_per_type_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregation (operators/skew.py) made
    driver-visible: same answer as a plain groupBy — the oracle IS the
    plain SQL — but each hot key spreads over 16 (key, salt) reducers in
    phase 1 before the tiny phase-2 merge. With only 5 event types, a
    plain groupBy at 100 TB would bottleneck on 5 reducers no matter how
    many executors exist; this plan's phase 1 uses 80."""
    from ..operators.skew import salted_aggregate

    ev = _events(spark, sf_dir).withColumn(
        "_high", F.when(F.col("value") >= 100, 1).otherwise(0)
    )
    return salted_aggregate(
        ev,
        ["event_type"],
        {"n": F.count(F.lit(1)), "n_high": F.sum("_high")},
        {"n": F.sum("n"), "n_high": F.sum("n_high").cast("long")},
        n_salts=16,
        unique_col="event_id",
    )


@register(
    "top_users_salted_join",
    tags=("A9", "skew", "J5"),
    oracle="""
    WITH hot AS (
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 20
    )
    SELECT h.user_id, h.n_events,
           CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors
    FROM events e JOIN hot h ON e.user_id = h.user_id
    GROUP BY h.user_id, h.n_events
    """,
)
def top_users_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated-dim join (operators/skew.py) made driver-visible:
    the 20 hottest users — by definition the skewed join keys — join back
    against the full event stream via (key, salt) so no single reducer
    owns a hot user's rows. Oracle is the plain join; answers must be
    identical, only the shuffle distribution differs."""
    from ..operators.skew import salted_broadcast_left

    ev = _events(spark, sf_dir)
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(20)
    )
    joined = salted_broadcast_left(
        ev.select("user_id", "event_type"), hot, "user_id",
        n_salts=8, unique_col="event_type",
    )
    return joined.groupBy("user_id", "n_events").agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors")
    )


@register(
    "events_value_histogram",
    tags=("histogram", "A1", "binning"),
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           CAST(CAST(FLOOR(value / 25.0) AS BIGINT) * 25.0 AS DOUBLE)
               AS bin_low,
           COUNT(*) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type, bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value measure per event type — the
    binning primitive behind every dashboard distribution panel (the
    reference's Grafana histograms bin exactly like this). One groupBy on
    (type, bin) with map-side partials; bin ids are exact-integer-valued
    doubles floored identically by both engines, and only order-
    independent aggregates (count/min/max) touch the double column, so no
    float-sum determinism hazard exists."""
    ev = _events(spark, sf_dir)
    bin_ = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "event_type",
            "bin",
            (F.col("bin") * F.lit(25.0)).alias("bin_low"),
            "n",
            "min_value",
            "max_value",
        )
    )


@register(
    "orders_snapshot_diff",
    tags=("DQ", "J-full", "reconciliation"),
    oracle="""
    WITH a AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    ), b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END
                   AS o_totalprice,
               CASE WHEN o_orderkey % 19 = 0
                    THEN 'RECHECK' ELSE o_orderpriority END
                   AS o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 101 = 0
    ), j AS (
        SELECT
            CASE WHEN a.o_orderkey IS NULL THEN 'added'
                 WHEN b.o_orderkey IS NULL THEN 'removed'
                 WHEN NOT (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice)
                   OR NOT (a.o_orderpriority
                           IS NOT DISTINCT FROM b.o_orderpriority)
                 THEN 'changed' ELSE 'unchanged' END AS status,
            NOT (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice) AS dp,
            NOT (a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority)
                AS dq
        FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT status, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN status = 'changed' AND dp THEN 1 ELSE 0 END)
                AS BIGINT) AS n_diff_o_totalprice,
           CAST(SUM(CASE WHEN status = 'changed' AND dq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_diff_o_orderpriority
    FROM j GROUP BY status
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py): classify every order
    key across two warehouse snapshots as added / removed / changed /
    unchanged with per-column drift attribution — the audit a gold table
    gets after each maintenance window. Snapshot B is a deterministic
    perturbation of the orders table (drop %97 keys, bump price on %13,
    reprioritize %19, clone %101 under shifted keys) so the oracle can
    replay the classification; a real pipeline passes yesterday's and
    today's snapshots. One co-keyed full-outer join, null-safe per-column
    equality (no cross-engine hashes), tiny status aggregate."""
    from ..operators.diff import diff_summary

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    kept = orders.filter(F.col("o_orderkey") % 97 != 0)
    modified = kept.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 19 == 0, F.lit("RECHECK"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    added = orders.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderpriority",
    )
    b = modified.unionByName(added)
    return diff_summary(
        orders, b, ["o_orderkey"], ["o_totalprice", "o_orderpriority"]
    )


# ---- conditional DISTINCT aggregation (FILTER clause) ---------------------
@register(
    "events_daily_conditional_distincts",
    tags=("A3", "A4", "extension"),
    oracle="""
    SELECT DATE '1970-01-01' + CAST(FLOOR(epoch(ts) / 86400) AS INTEGER)
               AS day,
           COUNT(DISTINCT user_id) AS dau,
           COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'error')
               AS dau_error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
    FROM events GROUP BY 1
    """,
)
def events_daily_conditional_distincts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COUNT(DISTINCT) under a FILTER clause — the BI 'DAU vs affected
    DAU' shape. Spark has no FILTER syntax on aggregates; the idiom is
    count_distinct(when(cond, col)) (when() yields NULL outside the
    condition and distinct-count ignores NULLs — exactly FILTER
    semantics). One shuffle carries all three aggregates; day buckets by
    integer epoch-day arithmetic so results are session-timezone-proof
    (see events_weekly_cohort_retention)."""
    ev = _events(spark, sf_dir)
    day = F.date_from_unix_date(
        F.floor(F.col("ts").cast("double") / 86400).cast("int")
    ).alias("day")
    return ev.groupBy(day).agg(
        F.count_distinct("user_id").alias("dau"),
        F.count_distinct(
            F.when(F.col("event_type") == "error", F.col("user_id"))
        ).alias("dau_error"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "n_purchases"
        ),
    )


@register(
    "events_limit_by",
    tags=("O2", "WF2", "clickhouse-surface", "limit-by"),
    oracle="""
    SELECT user_id, event_id, event_type, epoch(ts) AS ts_epoch
    FROM (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ) WHERE rn <= 2
    """,
)
def events_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT 2 BY user_id`` — the per-group head the
    reference's warehouse dialect offers as first-class syntax (each
    user's first two events in time order, event_id tiebreak for
    determinism). Spark-first this is one ranking window per key — the
    same single shuffle ClickHouse pays to group by the LIMIT BY key;
    never a per-group collect. Timestamps leave as exact fractional epoch
    seconds (both engines read the same micros)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.col("ts").cast("double").alias("ts_epoch"),
        )
    )


@register(
    "events_hourly_gapfill",
    tags=("A2", "clickhouse-surface", "with-fill"),
    oracle="""
    WITH spans AS (
        SELECT event_type,
               MIN(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT)) AS h0,
               MAX(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT)) AS h1
        FROM events GROUP BY event_type
    ), grid AS (
        SELECT s.event_type, g.h AS hour_epoch
        FROM spans s, LATERAL (SELECT unnest(generate_series(s.h0, s.h1)) AS h) g
    ), counts AS (
        SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_epoch,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.hour_epoch, COALESCE(c.n, 0) AS n
    FROM grid g LEFT JOIN counts c
      ON c.event_type = g.event_type AND c.hour_epoch = g.hour_epoch
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY hour WITH FILL`` — gap-filled hourly series
    per event type: every hour between a type's first and last event
    appears, zero when silent (a dashboard that skips empty buckets draws
    a misleading line — the reference's Grafana panels fill exactly so).
    Spark-first: the per-type [min,max] span is one aggregate, the dense
    grid is a ``sequence()`` explode of that span (rows ∝ hours, never a
    driver loop), and observed counts left-join onto it. Integer
    epoch-hour buckets keep every engine timezone-proof."""
    ev = _events(spark, sf_dir)
    hour = F.floor(F.col("ts").cast("double") / 3600).cast("long")
    counts = ev.groupBy(
        "event_type", hour.alias("hour_epoch")
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = (
        counts.groupBy("event_type")
        .agg(F.min("hour_epoch").alias("h0"), F.max("hour_epoch").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence(_guarded_span_start("h0", "h1"), F.col("h1"))
            ).alias("hour_epoch"),
        )
    )
    return grid.join(counts, ["event_type", "hour_epoch"], "left").select(
        "event_type",
        "hour_epoch",
        F.coalesce("n", F.lit(0)).alias("n"),
    )


def _funnel_by_join(views, signups, purchases) -> DataFrame:
    """Pair-materializing funnel: two per-user time-bounded equi-joins —
    existence tests, not sequential scans, so users parallelize freely.
    Fan-out is per-user quadratic, hence the ``should_salt`` gate in
    :func:`events_window_funnel` routes hot users away from it."""
    l2 = (
        views.join(signups, "user_id")
        .filter((F.col("s") > F.col("v")) & (F.col("s") <= F.col("v") + 21600))
        .select("user_id", "v", "s")
        .distinct()
    )
    l3 = (
        l2.join(purchases, "user_id")
        .filter((F.col("p") > F.col("s")) & (F.col("p") <= F.col("v") + 21600))
        .select("user_id")
        .distinct()
        .withColumn("is3", F.lit(True))
    )
    l2u = l2.select("user_id").distinct().withColumn("is2", F.lit(True))
    l1 = views.select("user_id").distinct()
    return (
        l1.join(l2u, "user_id", "left")
        .join(l3, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("is3"), F.lit(3))
            .when(F.col("is2"), F.lit(2))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("funnel_level"),
        )
    )


def _funnel_by_scan(views, signups, purchases) -> DataFrame:
    """Sequential funnel — ClickHouse windowFunnel's actual per-user
    sorted scan, O(n log n) with NO pair materialization: union the three
    event kinds, sort per user once, and per signup read off (a) the
    latest strictly-earlier view (running max) and (b) the earliest
    strictly-later purchase (reverse running min). Result-identical to
    :func:`_funnel_by_join` (equality-tested): a chain (v,s,p) with
    p <= v+21600 exists iff it exists for the LATEST view before s and
    the EARLIEST purchase after s — both bounds are monotone. Strict
    inequalities ride the sort's kind order (purchase < signup < view at
    equal timestamps keeps same-instant events out of both frames)."""
    ev3 = (
        views.select("user_id", F.col("v").alias("e"), F.lit(2).alias("k"))
        .unionByName(signups.select("user_id", F.col("s").alias("e"), F.lit(1).alias("k")))
        .unionByName(purchases.select("user_id", F.col("p").alias("e"), F.lit(0).alias("k")))
    )
    w = Window.partitionBy("user_id").orderBy("e", "k")
    last_view = F.max(F.when(F.col("k") == 2, F.col("e"))).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # reverse running min spelled as a GROWING frame over the DESCENDING
    # order — NOT rowsBetween(1, unboundedFollowing): Spark's
    # UnboundedFollowing frame recomputes the aggregate per row, O(n^2)
    # in partition size (measured 15.4 s vs 0.48 s on one 30k-row user;
    # the r10 skew probe caught the scan plan losing to the join plan it
    # exists to replace). Same rows: positions AFTER i ascending ==
    # positions BEFORE i descending, with the tie order mirrored.
    w_rev = Window.partitionBy("user_id").orderBy(
        F.col("e").desc(), F.col("k").desc()
    )
    next_purchase = F.min(F.when(F.col("k") == 0, F.col("e"))).over(
        w_rev.rowsBetween(Window.unboundedPreceding, -1)
    )
    sig = (
        ev3.withColumn("_lv", last_view)
        .withColumn("_np", next_purchase)
        .filter(F.col("k") == 1)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("_lv") >= F.col("e") - 21600, 1).otherwise(0)
            ).alias("_is2"),
            F.max(
                F.when(F.col("_np") <= F.col("_lv") + 21600, 1).otherwise(0)
            ).alias("_is3"),
        )
    )
    l1 = views.select("user_id").distinct()
    return l1.join(sig, "user_id", "left").select(
        "user_id",
        F.when(F.col("_is3") == 1, F.lit(3))
        .when(F.col("_is2") == 1, F.lit(2))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("funnel_level"),
    )


@register(
    "events_window_funnel",
    tags=("WF2", "funnel", "clickhouse-surface"),
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    l2 AS (
        SELECT DISTINCT v.user_id, v.ts AS vts, s.ts AS sts
        FROM v JOIN events s
          ON s.user_id = v.user_id AND s.event_type = 'signup'
         AND s.ts > v.ts AND epoch(s.ts) <= epoch(v.ts) + 21600
    ),
    l3 AS (
        SELECT DISTINCT l2.user_id
        FROM l2 JOIN events p
          ON p.user_id = l2.user_id AND p.event_type = 'purchase'
         AND p.ts > l2.sts AND epoch(p.ts) <= epoch(l2.vts) + 21600
    )
    SELECT v.user_id,
           CAST(CASE WHEN v.user_id IN (SELECT user_id FROM l3) THEN 3
                     WHEN v.user_id IN (SELECT DISTINCT user_id FROM l2) THEN 2
                     ELSE 1 END AS INT) AS funnel_level
    FROM (SELECT DISTINCT user_id FROM v) v
    """,
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(21600)(ts, view, signup, purchase)`` —
    the deepest strictly-ordered chain view -> signup -> purchase
    completed within six hours OF THE CHAIN'S FIRST STEP, per user (the
    sliding-window funnel, stricter than events_funnel_signup_purchase's
    adjacent-pair test: the whole chain must fit the window anchored at
    the view). Skew-gated like the other user-keyed joins: the count-min
    ``should_salt`` probe (one narrow pass over user_id, depth scalar
    rows to the driver) picks the plan the data needs — the
    pair-materializing joins when users are spread (map-side-efficient,
    no global sort), the per-user sorted scan when any user's share
    bound says the join fan-out would go quadratic. Both plans are
    result-identical (equality-tested with a planted hot user)."""
    from ..operators.heavy import should_salt

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("double").alias("e")
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", F.col("e").alias("v"))
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("e").alias("s")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("e").alias("p")
    )
    if should_salt(ev, ["user_id"], share_threshold=0.05):
        return _funnel_by_scan(views, signups, purchases)
    return _funnel_by_join(views, signups, purchases)


@register(
    "cheapest_supplier_per_part",
    tags=("A5", "argmin", "clickhouse-surface"),
    oracle="""
    SELECT l_partkey AS partkey, l_suppkey AS suppkey, l_extendedprice AS price
    FROM (
        SELECT l_partkey, l_suppkey, l_extendedprice,
               ROW_NUMBER() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_extendedprice ASC, l_suppkey ASC
               ) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMin — the mirror of the hub view's argMax (A5): per part, the
    supplier of the CHEAPEST shipment. ClickHouse's argMin is
    tie-nondeterministic; here the ordering value is a (price, suppkey)
    struct, so min_by picks a total-ordered winner and the answer is
    engine-portable. One map-side-combinable aggregate — same single
    shuffle as any GROUP BY, no window over the full fact."""
    li = load_table(spark, sf_dir, "lineitem")
    pick = F.struct(F.col("l_extendedprice"), F.col("l_suppkey"))
    return li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.min_by(F.col("l_suppkey"), pick).alias("suppkey"),
        F.min_by(F.col("l_extendedprice"), pick).alias("price"),
    )


@register(
    "events_hourly_gapfill_interpolate",
    tags=("A2", "clickhouse-surface", "with-fill", "interpolate"),
    bench=True,
    oracle="""
    WITH obs AS (
        SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS mv
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY event_type
    ), grid AS (
        SELECT s.event_type, g.h
        FROM spans s, LATERAL (SELECT unnest(generate_series(s.h0, s.h1)) AS h) g
    ), joined AS (
        SELECT g.event_type, g.h, o.mv,
               last_value(o.mv IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN o.mv IS NOT NULL THEN g.h END IGNORE NULLS)
                   OVER w_prev AS ph,
               first_value(o.mv IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN o.mv IS NOT NULL THEN g.h END IGNORE NULLS)
                   OVER w_next AS nh
        FROM grid g LEFT JOIN obs o ON o.event_type = g.event_type AND o.h = g.h
        WINDOW w_prev AS (PARTITION BY g.event_type ORDER BY g.h
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY g.event_type ORDER BY g.h
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS hour_epoch,
           (mv IS NOT NULL) AS observed,
           ROUND(COALESCE(mv, pv + (nv - pv) * (h - ph) / (nh - ph)) + 1e-9, 4)
               AS filled
    FROM joined
    """,
)
def events_hourly_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY hour WITH FILL INTERPOLATE`` — silent hours
    get a LINEARLY INTERPOLATED measure instead of a zero: the dashboard
    line for an hourly revenue metric should slope between neighbors,
    not plunge. The hourly measure is an exact decimal sum (cast double
    once), the dense grid is the sequence() explode, and the neighbor
    lookup is two IGNORE-NULLS windows per event type (prev/next value
    AND position, so the slope term is exact integer hour deltas). Edge
    hours are always observed (the grid spans each type's [min, max]),
    so the interpolation is well-defined; both engines round the one
    float expression identically."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.floor(F.col("ts").cast("double") / 3600).cast("long")
    obs = ev.groupBy(
        "event_type", hour.alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("mv"))
    grid = (
        obs.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence(_guarded_span_start("h0", "h1"), F.col("h1"))).alias("h"),
        )
    )
    j = grid.join(obs, ["event_type", "h"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observed value" as a GROWING frame over the DESCENDING hour
    # order — not (currentRow, unboundedFollowing): Spark recomputes
    # UnboundedFollowing frames per row (O(n^2) in partition size), and
    # the span clamp admits partitions up to MAX_FILL_HOURS rows. In
    # descending order the rows at-or-after h sit at-or-before it, and
    # the nearest one is the frame's LAST non-null.
    w_next = (
        Window.partitionBy("event_type")
        .orderBy(F.col("h").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = j.select(
        "event_type",
        "h",
        "mv",
        F.last("mv", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(F.when(F.col("mv").isNotNull(), F.col("h")), ignorenulls=True)
        .over(w_prev)
        .alias("ph"),
        F.last("mv", ignorenulls=True).over(w_next).alias("nv"),
        F.last(F.when(F.col("mv").isNotNull(), F.col("h")), ignorenulls=True)
        .over(w_next)
        .alias("nh"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("h") - F.col("ph")
    ) / (F.col("nh") - F.col("ph"))
    return marked.select(
        "event_type",
        F.col("h").alias("hour_epoch"),
        F.col("mv").isNotNull().alias("observed"),
        F.round(F.coalesce("mv", interp) + 1e-9, 4).alias("filled"),
    )


# --------------------------------------------------------------------------
# ClickHouse sequenceMatch (r9): ordered-subsequence existence per user
# --------------------------------------------------------------------------
@register(
    "events_sequence_match",
    tags=("WF2", "clickhouse-surface", "funnel"),
    bench=True,
    oracle="""
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS m FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS m
        FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.m
        WHERE e.event_type = 'signup' GROUP BY e.user_id
    ),
    m AS (
        SELECT DISTINCT e.user_id
        FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.m
        WHERE e.event_type = 'purchase'
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
               AS n_users,
           CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_matched
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')(ts, view, signup,
    purchase)`` per user: does an ordered view -> signup -> purchase
    subsequence exist, with NO window bound (the windowless sibling of
    ``events_window_funnel``).

    One shuffle + one per-user time sort, then three strictly-preceding
    window aggregates carry the match state down the stream — exactly
    ClickHouse's per-user sorted-scan cost model, linear in events, zero
    pair materialization (an ordered-subsequence EXISTS test never needs
    the quadratic step pairs; greedy earliest-first matching is complete
    for it). The DuckDB oracle replays the same greedy chain
    independently via correlated MIN subqueries. Equal-timestamp events
    for one user order arbitrarily (as in ClickHouse); the fixtures have
    none, and step comparisons are strict-in-time on both sides.

    Whale-gated (r11): Spark's window exec spills a huge partition to
    disk rather than OOM, but a 10⁸-event user still serializes one
    task; under the ``should_salt`` gate the query reuses the
    segment-fold counter (greedy earliest-first completes a chain iff
    one exists, so matched ⇔ count ≥ 1) — equality-tested against the
    window plan with a planted whale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("double").alias("e"),
    )
    from ..operators.heavy import should_salt

    if should_salt(ev, ["user_id"], share_threshold=0.05):
        per_user = _sequence_counts_by_segments(
            ev, ("view", "signup", "purchase")
        ).select("user_id", (F.col("c") >= 1).cast("int").alias("matched"))
        return per_user.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("matched").cast("long").alias("n_matched"),
        )
    prev = (
        Window.partitionBy("user_id")
        .orderBy("e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_ = lambda t: (F.col("event_type") == t).cast("int")  # noqa: E731
    staged = (
        ev.withColumn("seen1", F.coalesce(F.max(is_("view")).over(prev), F.lit(0)))
        .withColumn("hit2", (is_("signup") == 1) & (F.col("seen1") == 1))
        .withColumn(
            "seen2",
            F.coalesce(F.max(F.col("hit2").cast("int")).over(prev), F.lit(0)),
        )
        .withColumn("hit3", (is_("purchase") == 1) & (F.col("seen2") == 1))
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("hit3").cast("int")).alias("matched")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("matched").cast("long").alias("n_matched"),
    )


# --------------------------------------------------------------------------
# ClickHouse sequenceCount + retention (r10): the funnel siblings
# --------------------------------------------------------------------------
def _dfa_step(steps: tuple[str, ...]):
    """One transition of the greedy-restart ``sequenceCount`` automaton:
    acc = struct(stage, cnt), x = struct(e, event_type)."""
    k = len(steps)

    def step(acc, x):
        stage = None
        for i, ev in enumerate(steps):
            cond = (acc["stage"] == i) & (x["event_type"] == ev)
            nxt = F.lit((i + 1) % k)
            stage = F.when(cond, nxt) if stage is None else stage.when(cond, nxt)
        completed = (acc["stage"] == k - 1) & (x["event_type"] == steps[-1])
        return F.struct(
            stage.otherwise(acc["stage"]).alias("stage"),
            (acc["cnt"] + F.when(completed, 1).otherwise(0)).alias("cnt"),
        )

    return step


def sequence_count_expr(seq_col, steps: tuple[str, ...], init_stage: int = 0):
    """Greedy non-overlapping count of the ordered pattern
    ``(?1).*(?2)…(?k)`` over a time-sorted array of
    ``struct(e, event_type)`` — the ClickHouse ``sequenceCount``
    automaton as ONE ``F.aggregate`` higher-order fold (k states; after
    a chain completes the search RESTARTS, so an open chain consumes its
    step events: for steps (A, B) the sequence A A B B counts 1, not the
    maximum matching's 2). ``init_stage`` starts the automaton mid-chain
    (the segment-fold building block below)."""
    return F.aggregate(
        seq_col,
        F.struct(F.lit(init_stage).alias("stage"), F.lit(0).alias("cnt")),
        _dfa_step(steps),
    )["cnt"]


def sequence_state_table_expr(seq_col, steps: tuple[str, ...]):
    """The segment's full DFA transition summary: entry ``s`` = the
    (end_stage, completed_count) of running the greedy automaton over
    this time-sorted segment STARTING at stage ``s``. A sequential fold
    becomes mergeable this way — tables compose like functions
    (associatively), so per-user state can be carried across ordered
    segments without ever materializing the user's whole event stream
    in one task. k tables = k folds over the same array, still zero
    Python in the row path."""
    k = len(steps)
    entries = []
    for s0 in range(k):
        folded = F.aggregate(
            seq_col,
            F.struct(F.lit(s0).alias("stage"), F.lit(0).alias("cnt")),
            _dfa_step(steps),
        )
        entries.append(
            F.struct(
                folded["stage"].alias("end_stage"), folded["cnt"].alias("cnt")
            )
        )
    return F.array(*entries)


def _sequence_counts_by_collect(ev: DataFrame, steps: tuple[str, ...]) -> DataFrame:
    """(user_id, c): one collect_list + sort + fold per user — ClickHouse's
    own per-group arena cost model. The default plan; a whale user's full
    stream lands in ONE task's array, which is why it's gated."""
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("e", "event_type"))).alias("seq")
    )
    return per_user.select(
        "user_id", sequence_count_expr(F.col("seq"), steps).alias("c")
    )


def _sequence_counts_by_segments(
    ev: DataFrame, steps: tuple[str, ...], seg_secs: int = 3600
) -> DataFrame:
    """(user_id, c), whale-safe: events bucket into ``seg_secs`` time
    segments, each (user, segment) folds to a k-entry DFA transition
    table (bounded by the segment's event count), and the per-user
    reduce composes the TABLES in segment order — array size = number of
    segments (time-range / seg_secs), never the user's event count. A
    10⁸-event bot user costs ~10⁴ tiny structs in the final fold instead
    of a 10⁸-element array in one task. Result-identical to the collect
    plan (equality-tested with a planted whale): segment boundaries
    split on time, within-segment ties keep the same (e, event_type)
    sort, and cross-segment ties cannot exist."""
    per_seg = (
        ev.withColumn("seg", F.floor(F.col("e") / seg_secs).cast("long"))
        .groupBy("user_id", "seg")
        .agg(F.array_sort(F.collect_list(F.struct("e", "event_type"))).alias("seq"))
        .select(
            "user_id",
            "seg",
            sequence_state_table_expr(F.col("seq"), steps).alias("t"),
        )
    )
    per_user = per_seg.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("seg", "t"))).alias("segs")
    )

    def compose(acc, seg):
        entry = F.element_at(seg["t"], acc["stage"] + 1)
        return F.struct(
            entry["end_stage"].alias("stage"),
            (acc["cnt"] + entry["cnt"]).alias("cnt"),
        )

    final = F.aggregate(
        F.col("segs"),
        F.struct(F.lit(0).alias("stage"), F.lit(0).alias("cnt")),
        compose,
    )["cnt"]
    return per_user.select("user_id", final.alias("c"))


def _sequence_counts(ev: DataFrame, steps: tuple[str, ...]) -> DataFrame:
    """Whale-gated per-user greedy chain counts (r10 verdict #5): the
    count-min ``should_salt`` probe (same gate, same threshold as
    ``events_window_funnel``) routes hot-user data to the segment-fold
    plan whose task memory is bounded by events-per-hour, not
    events-per-user; uniform data keeps the cheaper single-exchange
    collect plan."""
    from ..operators.heavy import should_salt

    if should_salt(ev, ["user_id"], share_threshold=0.05):
        return _sequence_counts_by_segments(ev, steps)
    return _sequence_counts_by_collect(ev, steps)


@register(
    "events_sequence_count",
    tags=("WF2", "clickhouse-surface", "funnel"),
    bench=True,
    oracle="""
    WITH RECURSIVE walk(user_id, pos, cnt) AS (
        SELECT user_id, TIMESTAMP '1970-01-01', 0
        FROM (SELECT DISTINCT user_id FROM events)
        UNION ALL
        SELECT user_id, m3, cnt + 1 FROM (
            SELECT w.user_id, w.cnt,
                (SELECT MIN(e3.ts) FROM events e3
                 WHERE e3.user_id = w.user_id
                   AND e3.event_type = 'purchase'
                   AND e3.ts > (
                    SELECT MIN(e2.ts) FROM events e2
                    WHERE e2.user_id = w.user_id
                      AND e2.event_type = 'signup'
                      AND e2.ts > (
                        SELECT MIN(e1.ts) FROM events e1
                        WHERE e1.user_id = w.user_id
                          AND e1.event_type = 'view'
                          AND e1.ts > w.pos))) AS m3
            FROM walk w
        ) WHERE m3 IS NOT NULL
    ),
    per_user AS (SELECT user_id, MAX(cnt) AS c FROM walk GROUP BY user_id)
    SELECT CAST(c AS INT) AS n_chains,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY c
    """,
)
def events_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1).*(?2).*(?3)')(ts, view, signup,
    purchase)`` per user: how many NON-OVERLAPPING ordered
    view -> signup -> purchase chains exist — greedy left-to-right,
    restarting the search after each completed chain (the documented
    ClickHouse semantics; NOT maximum matching: for A A B B a 2-step
    count is 1, the second A is consumed by the open chain).

    Spark-first shape = ClickHouse's own cost model: ClickHouse collects
    each group's (timestamp, event) pairs in memory, sorts, and runs the
    pattern automaton once. Here that is ``collect_list`` + ``array_sort``
    per user and ONE ``F.aggregate`` higher-order fold running the 3-state
    DFA — one exchange (the user-id aggregation), zero joins, zero pair
    materialization, no Python in the row path. Per-user event counts
    bound the array exactly as they bound ClickHouse's per-group arena —
    and (r11) the same whale gate as ``events_window_funnel`` routes
    hot-user data to the segment-fold plan (:func:`_sequence_counts`),
    whose task memory is bounded by events-per-hour, never
    events-per-user.

    The DuckDB oracle replays the greedy restart independently: a
    recursive CTE advances a per-user cursor through correlated-MIN
    chains (one recursion level per completed chain). Output is the
    per-user chain-count distribution."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("double").alias("e"),
    )
    counts = _sequence_counts(ev, ("view", "signup", "purchase"))
    return counts.groupBy("c").agg(
        F.col("c").cast("int").alias("n_chains"),
        F.count(F.lit(1)).alias("n_users"),
    ).drop("c")


@register(
    "events_retention",
    tags=("A3", "clickhouse-surface", "funnel"),
    bench=True,
    oracle="""
    WITH pu AS (
        SELECT user_id,
            MAX(CASE WHEN event_type = 'view' AND FLOOR(epoch(ts) / 86400) =
                (SELECT MIN(FLOOR(epoch(ts) / 86400)) FROM events)
                THEN 1 ELSE 0 END) AS r1,
            MAX(CASE WHEN event_type = 'purchase' AND FLOOR(epoch(ts) / 86400) =
                (SELECT MIN(FLOOR(epoch(ts) / 86400)) FROM events) + 1
                THEN 1 ELSE 0 END) AS r2,
            MAX(CASE WHEN event_type = 'purchase' AND FLOOR(epoch(ts) / 86400) =
                (SELECT MIN(FLOOR(epoch(ts) / 86400)) FROM events) + 7
                THEN 1 ELSE 0 END) AS r3,
            MAX(CASE WHEN event_type = 'purchase' AND FLOOR(epoch(ts) / 86400) =
                (SELECT MIN(FLOOR(epoch(ts) / 86400)) FROM events) + 14
                THEN 1 ELSE 0 END) AS r4
        FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(r1) AS BIGINT) AS cohort_users,
           CAST(SUM(r1 * r2) AS BIGINT) AS ret_d1,
           CAST(SUM(r1 * r3) AS BIGINT) AS ret_d7,
           CAST(SUM(r1 * r4) AS BIGINT) AS ret_d14
    FROM pu
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond1, …, condN)``: per user an array of
    flags where ``r1`` = cond1 ever held and ``r_i`` = cond1 AND cond_i
    both held (the documented semantics — conditions are plain
    predicates, no ordering requirement), then the usual
    ``sum(r[i])`` rollup. Cohort = viewed on the fixture's first day;
    retained = purchased on day +1 / +7 / +14.

    Day bucketing is INTEGER epoch-day arithmetic
    (``floor(epoch / 86400)``) on both sides — ``ts`` is an instant, so
    any to_date/date_trunc spelling would regroup days under a non-UTC
    driver session (the standing verify probe).

    Plan: one tiny min-day aggregate broadcast onto the fact scan, one
    user-keyed conditional aggregation (map-side partial), one final
    single-row reduce — no joins beyond the broadcast, no window, scales
    as a single fact pass at any user count. Since r11 the per-user
    flags come from the reusable :func:`operators.retention.retention`
    (ClickHouse's N-arbitrary-predicate surface); this query is its
    oracled instance."""
    from ..operators.retention import retention

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d"),
    )
    d0 = ev.agg(F.min("d").alias("d0"))
    j = ev.join(F.broadcast(d0))
    cond = lambda t, off: (  # noqa: E731
        (F.col("event_type") == t) & (F.col("d") == F.col("d0") + off)
    )
    per_user = retention(
        j,
        [cond("view", 0), cond("purchase", 1), cond("purchase", 7), cond("purchase", 14)],
        key_cols=("user_id",),
    )
    return per_user.agg(
        F.sum("r1").cast("long").alias("cohort_users"),
        F.sum("r2").cast("long").alias("ret_d1"),
        F.sum("r3").cast("long").alias("ret_d7"),
        F.sum("r4").cast("long").alias("ret_d14"),
    )


# --------------------------------------------------------------------------
# ClickHouse windowFunnel strict modes (r11): the mode flags the join/scan
# funnel cannot express, via the operators/funnel.py automaton fold
# --------------------------------------------------------------------------
_FUNNEL_STEPS = ("view", "signup", "purchase")
_FUNNEL_WINDOW = 21600


def _funnel_mode_query(spark: SparkSession, sf_dir: str, **mode) -> DataFrame:
    from ..operators.funnel import window_funnel_levels

    ev = load_table(spark, sf_dir, "events")
    levels = window_funnel_levels(ev, _FUNNEL_STEPS, _FUNNEL_WINDOW, **mode)
    return levels.groupBy("funnel_level").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def _register_funnel_mode(name: str, doc: str, bench: bool = False, **mode) -> None:
    from ..operators.funnel import window_funnel_oracle_sql

    @register(
        name,
        tags=("WF2", "funnel", "clickhouse-surface"),
        bench=bench,
        oracle=window_funnel_oracle_sql(_FUNNEL_STEPS, _FUNNEL_WINDOW, **mode),
    )
    def q(spark: SparkSession, sf_dir: str, _mode=dict(mode)) -> DataFrame:
        return _funnel_mode_query(spark, sf_dir, **_mode)

    q.__doc__ = doc
    q.__name__ = name


_register_funnel_mode(
    "events_funnel_strict_order",
    """ClickHouse ``windowFunnel(21600, 'strict_order')(ts, view, signup,
    purchase)`` level distribution: once the chain has started, ANY event
    matching no condition (a click or an error) terminates the per-user
    search — "A->B->D->C stops at D, level 2". The one mode that must
    scan the FULL event stream (non-chain events carry meaning), so no
    type filter is pushed; everything else is the shared automaton fold
    in ``operators/funnel.py`` (one shuffle, zero Python, per-user arena
    = ClickHouse's own cost model). Oracled by the same automaton as a
    DuckDB recursive CTE over the identical (ts, event_id) total
    order.""",
    strict_order=True,
)

_register_funnel_mode(
    "events_funnel_strict_dedup",
    """ClickHouse ``windowFunnel(21600, 'strict_dedup')(ts, view, signup,
    purchase)`` level distribution: a repeated event whose condition slot
    is already satisfied (a second signup after one already chained)
    interrupts the search and returns that condition's level. Cond-1
    repeats are exempt (they restart the candidate chain, per the
    published scan). Non-chain event types are pruned at the parquet
    scan; one collect+sort+fold per user.""",
    bench=True,
    strict_dedup=True,
)

_register_funnel_mode(
    "events_funnel_strict_increase",
    """ClickHouse ``windowFunnel(21600, 'strict_increase')(ts, view,
    signup, purchase)`` level distribution: each chain step must carry a
    STRICTLY larger timestamp than the previous step's event — equal-
    timestamp bursts (bot replays, batched ingests) never chain, where
    the default mode lets them. Identical to the default on tie-free
    data; diverges exactly on duplicate (user, ts) streams — the skewed
    fixture exercises it. Same fold, same pushed type filter.""",
    strict_increase=True,
)


# --------------------------------------------------------------------------
# ClickHouse sequenceMatch time-constraint atoms (r11): (?t<=n) / (?t>n)
# --------------------------------------------------------------------------
def _register_seq_timed(name: str, steps, gaps, doc: str, bench: bool = False) -> None:
    from ..operators.seqmatch import (
        sequence_match_timed,
        sequence_match_timed_oracle_sql,
    )

    @register(
        name,
        tags=("WF2", "clickhouse-surface", "funnel"),
        bench=bench,
        oracle=sequence_match_timed_oracle_sql(steps, gaps),
    )
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        per_user = sequence_match_timed(ev, steps, gaps)
        return per_user.agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("matched").cast("long").alias("n_matched"),
        )

    q.__doc__ = doc
    q.__name__ = name


_register_seq_timed(
    "events_sequence_match_within1h",
    ("view", "signup", "purchase"),
    (("<=", 3600), ("<=", 3600)),
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)(?t<=3600)(?3)')(ts,
    view, signup, purchase)``: an ordered chain where EACH step lands
    within an hour of the previous one (arbitrary events in between).
    Greedy earliest-first matching is incomplete under gap bounds, so
    this runs the keep-latest DP in ``operators/seqmatch.py`` — two
    strictly-preceding running maxes, one shuffle, linear per user, and
    the identical window-function SQL is the DuckDB oracle (no
    recursion).""",
    bench=True,
)

_register_seq_timed(
    "events_sequence_match_spaced",
    ("view", "signup", "purchase"),
    (("<=", 3600), (">", 600)),
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)(?t>600)(?3)')(ts,
    view, signup, purchase)``: signup within an hour of a view, then a
    purchase MORE than ten minutes after such a signup (deliberation
    gate — the pattern shape dwell-time analyses use). Exercises both
    carry directions of the DP: a running MAX feeds the ``<=`` bound, a
    running MIN feeds the ``>`` bound (the earliest qualifying signup is
    the one a late-enough purchase clears first).""",
)


# --------------------------------------------------------------------------
# ClickHouse largestTriangleThreeBuckets (r11): dashboard downsampling
# --------------------------------------------------------------------------
def _lttb_oracle() -> str:
    from ..operators.lttb import lttb_oracle_sql

    return lttb_oracle_sql(
        20,
        base_sql=(
            "SELECT event_type AS s, "
            "CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS x, "
            "CAST(COUNT(*) AS BIGINT) AS y "
            "FROM events GROUP BY 1, 2"
        ),
        series_alias="event_type",
    )


@register(
    "events_hourly_lttb",
    tags=("A2", "clickhouse-surface", "downsample"),
    bench=True,
    oracle=_lttb_oracle(),
)
def events_hourly_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets(20)(hour, count)`` per
    event type: each hourly series downsampled to the 20 visually
    dominant points (first, last, and the largest-triangle pick from 18
    equal-count buckets) — what a Grafana panel should pull instead of
    the full series at 100 TB. Integer hour buckets and integer-scaled
    triangle scores keep the argmax exact and engine-portable (see
    ``operators/lttb.py``); the DuckDB oracle replays the identical
    selection as a recursive CTE. Series no longer than 20 points pass
    through unchanged."""
    from ..operators.lttb import lttb

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return lttb(hourly, "event_type", "x", "y", 20).select(
        F.col("s").alias("event_type"), "x", "y"
    )


# --------------------------------------------------------------------------
# ClickHouse sequenceNextNode + uniqUpTo (r11): path analysis rollup
# --------------------------------------------------------------------------
@register(
    "events_sequence_next_node",
    tags=("WF2", "clickhouse-surface", "path-analysis"),
    oracle="""
    WITH pts AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS pos
        FROM events
    ),
    p1 AS (
        SELECT user_id, MIN(pos) AS p1 FROM pts
        WHERE event_type = 'view' GROUP BY user_id
    ),
    nxt AS (
        SELECT p.user_id,
               MAX(CASE WHEN t.pos = p.p1 + 1 AND t.event_type = 'signup'
                        THEN 1 ELSE 0 END) AS chained,
               MAX(CASE WHEN t.pos = p.p1 + 2 THEN t.event_type END) AS nx
        FROM p1 p JOIN pts t ON t.user_id = p.user_id
                  AND t.pos BETWEEN p.p1 + 1 AND p.p1 + 2
        GROUP BY p.user_id
    )
    SELECT COALESCE(CASE WHEN chained = 1 THEN nx END, '(none)')
               AS next_event,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM nxt GROUP BY 1
    """,
)
def events_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'first_match')(ts,
    event_type, event_type = 'view', event_type = 'signup')`` rolled up
    to the next-step distribution — path analysis ("after the first
    view that is IMMEDIATELY followed by a signup, where do users go
    next?"), the query behind a sankey panel. Per user: the chain
    anchors at the FIRST view, must match consecutively (the next event
    is the signup), and the value returned is the event after the
    chain; unmatched users roll up under '(none)' (ClickHouse returns
    NULL). One row_number window + one conditional aggregation over a
    2-row neighborhood join — no collect, no recursion, identical SQL
    on both engines; ties pin to the (ts, event_id) total order."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id")))
        .alias("pos"),
    )
    p1 = (
        pts.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("pos").alias("p1"))
    )
    nxt = (
        p1.join(pts, "user_id")
        .filter(F.col("pos").between(F.col("p1") + 1, F.col("p1") + 2))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("pos") == F.col("p1") + 1)
                    & (F.col("event_type") == "signup"),
                    1,
                ).otherwise(0)
            ).alias("chained"),
            F.max(
                F.when(F.col("pos") == F.col("p1") + 2, F.col("event_type"))
            ).alias("nx"),
        )
    )
    return nxt.groupBy(
        F.coalesce(
            F.when(F.col("chained") == 1, F.col("nx")), F.lit("(none)")
        ).alias("next_event")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


@register(
    "events_uniq_upto",
    tags=("A-ext", "clickhouse-surface"),
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN COUNT(DISTINCT user_id) <= 100
                     THEN COUNT(DISTINCT user_id) ELSE 101 END AS BIGINT)
               AS uniq_upto_100
    FROM events GROUP BY event_type
    """,
)
def events_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(100)(user_id)`` per event type: the exact
    distinct count while it is <= 100, else 101 — the cheap "are there
    more than N distinct?" gate ClickHouse uses for alerting thresholds.
    Spark computes the same capped exact distinct; at 100 TB the cap is
    what matters — the answer saturates, so a pre-aggregated
    first-100-per-group pass (LIMIT-BY shape) can bound state where a
    full distinct would not."""
    ev = load_table(spark, sf_dir, "events")
    d = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        F.when(d <= 100, d).otherwise(F.lit(101)).cast("long").alias("uniq_upto_100")
    )


# --------------------------------------------------------------------------
# ClickHouse deltaSumTimestamp (r11): counter-reset-aware monotone sum
# --------------------------------------------------------------------------
@register(
    "events_value_delta_sum",
    tags=("clickhouse-surface", "A-ext", "monitoring"),
    oracle="""
    WITH ordered AS (
        SELECT event_type, value,
               LAG(value) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT event_type,
           ROUND(SUM(CASE WHEN prev IS NOT NULL AND value > prev
                          THEN value - prev ELSE 0 END) + 1e-9, 4)
               AS delta_sum
    FROM ordered GROUP BY event_type
    """,
)
def events_value_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSumTimestamp(value, ts)`` per event type: the
    sum of POSITIVE increments along the time-ordered value sequence —
    the counter-reset-aware rate primitive Prometheus-style monitoring
    uses (a counter that resets to 0 contributes nothing negative). The
    order is the pinned (ts, event_id) total order on both engines; one
    lag window + one aggregation, and the double sum follows the repo's
    float-hash discipline (ROUND(x + 1e-9, 4) on BOTH sides)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts"), F.col("event_id"))
    d = ev.withColumn("prev", F.lag("value").over(w))
    inc = F.when(
        F.col("prev").isNotNull() & (F.col("value") > F.col("prev")),
        F.col("value") - F.col("prev"),
    ).otherwise(F.lit(0.0))
    return d.groupBy("event_type").agg(
        F.round(F.sum(inc) + F.lit(1e-9), 4).alias("delta_sum")
    )


# --------------------------------------------------------------------------
# ClickHouse exponentialMovingAverage (r11): EWMA smoothing per series
# --------------------------------------------------------------------------
@register(
    "events_hourly_ewma",
    tags=("clickhouse-surface", "A2", "smoothing"),
    oracle="""
    WITH RECURSIVE hourly AS (
        SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(COUNT(*) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    ),
    pts AS (
        SELECT event_type, h, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS pos,
               COUNT(*)    OVER (PARTITION BY event_type) AS n
        FROM hourly
    ),
    st AS (
        SELECT event_type, h, y, pos, n, y AS ewma FROM pts WHERE pos = 1
        UNION ALL
        SELECT p.event_type, p.h, p.y, p.pos, p.n,
               (2.0 / 11.0) * p.y + (1.0 - 2.0 / 11.0) * s.ewma
        FROM st s JOIN pts p
          ON p.event_type = s.event_type AND p.pos = s.pos + 1
        WHERE s.pos < s.n
    )
    SELECT event_type, h AS hour_epoch, ROUND(ewma + 1e-9, 4) AS ewma
    FROM st
    """,
)
def events_hourly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage`` over each type's hourly
    count series (span-10 fixed alpha = 2/11, seeded with the first
    observation — the pandas ``ewm(span=10, adjust=False)`` recurrence):
    ``s_i = a*y_i + (1-a)*s_{i-1}``, the smoothing behind every
    dashboard trend line. The recurrence uses ONLY multiply/add on the
    same operands in the same order on both engines, so the floats are
    bit-identical before the defensive ROUND; the closed-form
    prefix-product rewrite would overflow ``(1-a)^-i`` and is exactly
    the trap this sequential fold avoids. One fold per series over the
    hourly aggregate (state = one double — series length is bounded by
    the time span, never by raw event count)."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    per_series = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("h", "y"))).alias("pts")
    )
    a = 2.0 / 11.0

    def step(acc, p):
        prev = F.element_at(acc, -1)
        sm = F.when(
            F.size(acc) == 0, p["y"]
        ).otherwise(F.lit(a) * p["y"] + F.lit(1.0 - a) * prev["ewma"])
        return F.concat(
            acc, F.array(F.struct(p["h"].alias("h"), sm.alias("ewma")))
        )

    folded = F.aggregate(
        F.col("pts"),
        F.expr("CAST(array() AS array<struct<h: bigint, ewma: double>>)"),
        step,
    )
    return per_series.select(
        "event_type", F.explode(folded).alias("p")
    ).select(
        "event_type",
        F.col("p.h").alias("hour_epoch"),
        F.round(F.col("p.ewma") + F.lit(1e-9), 4).alias("ewma"),
    )


# --------------------------------------------------------------------------
# ClickHouse entropy() (r11): behavioral diversity per user
# --------------------------------------------------------------------------
@register(
    "events_user_type_entropy",
    tags=("clickhouse-surface", "A-ext", "quality"),
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS k FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, SUM(k) AS n FROM c GROUP BY 1)
    SELECT c.user_id,
           ROUND(-SUM((k * 1.0 / n) * LOG2(k * 1.0 / n)) + 1e-9, 4)
               AS type_entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
)
def events_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy(event_type)`` per user: Shannon entropy (bits)
    of each user's event-type distribution — the behavioral-diversity
    signal bot detection and curation filters use (a scripted client
    hammering one event type scores ~0; organic users spread). Two
    map-side-combining aggregations (per (user, type) counts, then the
    per-user reduce) — no window, no collect, scales as a pure
    double-groupBy at any user count. The float follows the repo's hash
    discipline (ROUND(x + 1e-9, 4) both sides; log2 libm drift is
    ~1e-15, four decimals absorb it)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k"))
    t = c.groupBy("user_id").agg(F.sum("k").alias("n"))
    p = F.col("k") / F.col("n")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(F.round(-F.sum(p * F.log2(p)) + F.lit(1e-9), 4).alias("type_entropy"))
    )


# --------------------------------------------------------------------------
# Window-function surface depth (r11): the full ranking/navigation family
# --------------------------------------------------------------------------
@register(
    "events_window_function_suite",
    tags=("WF2", "clickhouse-surface", "window"),
    oracle="""
    SELECT event_id,
           event_type,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_val,
           NTH_VALUE(value, 3) OVER w AS third_val,
           CAST(DENSE_RANK() OVER (PARTITION BY event_type ORDER BY
               ROUND(value) ) AS BIGINT) AS value_dense_rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY
               event_id) + 1e-9, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY event_type ORDER BY
               event_id) + 1e-9, 4) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def events_window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window navigation/ranking family in one pass per event
    type (ClickHouse window functions: ``lagInFrame`` / ``leadInFrame``
    / ``first_value`` / ``nth_value`` / ``dense_rank`` / ``ntile`` /
    ``percent_rank`` / ``cume_dist``): ordered by the pinned
    (ts, event_id) total order — every rank here is tie-deterministic
    (ntile/percent_rank/cume_dist order by the unique event_id; the
    dense_rank orders by the quantized value so ranks are genuinely
    dense).  ONE Window exchange per partition spec; the navigation
    frame is the Spark default (unbounded preceding → current row),
    growing — never shrinking (the r10 frame lesson)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wid = Window.partitionBy("event_type").orderBy("event_id")
    wv = Window.partitionBy("event_type").orderBy(F.round("value"))
    return ev.select(
        "event_id",
        "event_type",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
        F.nth_value("value", 3).over(w).alias("third_val"),
        F.dense_rank().over(wv).cast("long").alias("value_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(wid) + F.lit(1e-9), 4).alias(
            "pct_rank"
        ),
        F.round(F.cume_dist().over(wid) + F.lit(1e-9), 4).alias("cume"),
    )


@register(
    "events_rolling_7d_uniques",
    tags=("clickhouse-surface", "A-ext", "window", "rolling-distinct"),
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
               user_id
        FROM events
    ),
    span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM du),
    cover AS (
        SELECT du.user_id, du.d + g.o AS wd
        FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) g
    )
    SELECT c.wd AS day_epoch,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS uniques_7d
    FROM cover c, span s
    WHERE c.wd BETWEEN s.d0 AND s.d1
    GROUP BY c.wd
    """,
)
def events_rolling_7d_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day — the BI "7-day active
    users" series.  Distinct counts are NOT associative, so no window
    frame can roll them; the distributed spelling is the covering-window
    explode: reduce to distinct (day, user) pairs (tiny vs the fact),
    explode each pair into the 7 window-end days it contributes to
    (constant fan-out), and run one countDistinct per window day.
    Cost: 7 x |distinct day-user pairs| — independent of event volume,
    the property that makes this shape survive 100 TB where a naive
    per-day self-join over raw events would not.  Day bucketing is
    integer epoch-day (timezone-proof); the grid is clamped to observed
    days so both engines emit identical rows."""
    from ..operators.rolling import rolling_distinct

    ev = load_table(spark, sf_dir, "events")
    return rolling_distinct(
        ev,
        (F.col("ts").cast("double") / 86400).cast("long"),
        F.col("user_id"),
        window=7,
        out_period="day_epoch",
        out_count="uniques_7d",
    )
