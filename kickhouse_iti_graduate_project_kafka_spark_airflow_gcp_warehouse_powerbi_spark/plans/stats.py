"""Catalog queries for the ClickHouse statistical-aggregate surface.

The reference warehouse exposes ClickHouse's one-shot statistical
aggregates to its BI layer (``welchTTest`` / ``studentTTest`` /
``mannWhitneyUTest`` / ``kolmogorovSmirnovTest`` / ``cramersV`` /
``theilsU`` / ``simpleLinearRegression`` / ``boundingRatio`` /
``skewPop`` / ``kurtPop`` — ClickHouse SQL reference, aggregate
functions).  Each query here is one of those aggregates re-expressed
through :mod:`..operators.stats` over the driver fixtures, with the
DuckDB oracle spelling the identical closed-form arithmetic.

Hash discipline: every float output is a SCALE-FREE statistic (or a
bounded-magnitude mean) rounded ``ROUND(x + 1e-9, 4)`` on both engines;
counts stay exact BIGINT (oracle sums are cast — DuckDB SUM(int) widens
to HUGEINT otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.stats import (
    bounding_ratio,
    cramers_v,
    ks_2samp,
    mann_whitney_u,
    pop_moments,
    simple_linreg,
    theils_u,
    ttest,
)
from ..sources.tables import load_table

#: The A/B split every orders-side test below uses: high-urgency orders
#: (ClickHouse sample_index = 1) vs the rest.
_HI = ("1-URGENT", "2-HIGH")


def _r4(c: Column) -> Column:
    return F.round(c + F.lit(1e-9), 4)


def _ttest_query(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    res = ttest(
        orders,
        F.col("o_totalprice"),
        F.col("o_orderpriority").isin(*_HI),
        by=("o_orderstatus",),
        kind=kind,
    )
    return res.select(
        "o_orderstatus",
        "n1",
        "n2",
        _r4(F.col("mean1")).alias("mean1"),
        _r4(F.col("mean2")).alias("mean2"),
        _r4(F.col("t_stat")).alias("t_stat"),
        _r4(F.col("df_deg")).alias("df_deg"),
    )


_TTEST_ORACLE_BODY = """
    WITH f AS (
        SELECT o_orderstatus,
               o_totalprice AS v,
               o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi
        FROM orders
    ),
    s AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) FILTER (WHERE hi) AS BIGINT) AS n1,
               AVG(v)      FILTER (WHERE hi)  AS m1,
               VAR_SAMP(v) FILTER (WHERE hi)  AS s1,
               CAST(COUNT(*) FILTER (WHERE NOT hi) AS BIGINT) AS n2,
               AVG(v)      FILTER (WHERE NOT hi) AS m2,
               VAR_SAMP(v) FILTER (WHERE NOT hi) AS s2
        FROM f GROUP BY o_orderstatus
    )
"""


@register(
    "orders_price_welch_ttest",
    bench=True,
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle=_TTEST_ORACLE_BODY
    + """
    SELECT o_orderstatus, n1, n2,
           ROUND(m1 + 1e-9, 4) AS mean1,
           ROUND(m2 + 1e-9, 4) AS mean2,
           ROUND((m1 - m2) / SQRT(s1 / n1 + s2 / n2) + 1e-9, 4) AS t_stat,
           ROUND(POWER(s1 / n1 + s2 / n2, 2)
                 / (POWER(s1 / n1, 2) / (n1 - 1)
                    + POWER(s2 / n2, 2) / (n2 - 1)) + 1e-9, 4) AS df_deg
    FROM s
    """,
)
def orders_price_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``welchTTest(o_totalprice, hi)`` per order status: do
    high-urgency orders carry different prices?  Unpooled variances +
    Welch–Satterthwaite df; one conditional aggregation, no second
    fact pass (operators/stats.ttest)."""
    return _ttest_query(spark, sf_dir, "welch")


@register(
    "orders_price_student_ttest",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle=_TTEST_ORACLE_BODY
    + """
    SELECT o_orderstatus, n1, n2,
           ROUND(m1 + 1e-9, 4) AS mean1,
           ROUND(m2 + 1e-9, 4) AS mean2,
           ROUND((m1 - m2) / SQRT(((n1 - 1) * s1 + (n2 - 1) * s2)
                                  / (n1 + n2 - 2) * (1.0 / n1 + 1.0 / n2))
                 + 1e-9, 4) AS t_stat,
           ROUND(CAST(n1 + n2 - 2 AS DOUBLE) + 1e-9, 4) AS df_deg
    FROM s
    """,
)
def orders_price_student_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest``: the pooled-variance sibling of
    ``orders_price_welch_ttest`` (same single-pass shape)."""
    return _ttest_query(spark, sf_dir, "student")


@register(
    "events_value_mannwhitney",
    bench=True,
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    WITH d AS (
        SELECT value AS v, CAST(event_type = 'click' AS INT) AS k1i
        FROM events WHERE event_type IN ('click', 'error')
    ),
    c AS (
        SELECT v, CAST(SUM(k1i) AS BIGINT) AS k1,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM d GROUP BY v
    ),
    r AS (
        SELECT k1, m,
               COALESCE(SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (m + 1) / 2.0 AS rk
        FROM c
    ),
    g AS (
        SELECT CAST(SUM(k1) AS BIGINT) AS n1,
               CAST(SUM(m - k1) AS BIGINT) AS n2,
               SUM(k1 * rk) AS r1,
               CAST(SUM(m * m * m - m) AS BIGINT) AS ties
        FROM r
    )
    SELECT n1, n2,
           ROUND(r1 - n1 * (n1 + 1) / 2.0 + 1e-9, 4) AS u_stat,
           ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / SQRT(n1 * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - ties * 1.0 / ((n1 + n2) * (n1 + n2 - 1))))
                 + 1e-9, 4) AS z_stat
    FROM g
    """,
)
def events_value_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest(value, sample)`` for click vs error
    events: exact tie-corrected U + normal z.  Mid-ranks come from a
    prefix sum over per-DISTINCT-value counts, so the only window is
    bounded by value cardinality, not row count
    (operators/stats.mann_whitney_u)."""
    ev = load_table(spark, sf_dir, "events")
    res = mann_whitney_u(
        ev,
        F.col("value"),
        F.col("event_type") == "click",
        F.col("event_type") == "error",
    )
    return res.select(
        "n1",
        "n2",
        _r4(F.col("u_stat")).alias("u_stat"),
        _r4(F.col("z_stat")).alias("z_stat"),
    )


@register(
    "events_value_ks_test",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    WITH d AS (
        SELECT value AS v,
               CAST(event_type = 'click' AS INT) AS k1i,
               CAST(event_type = 'error' AS INT) AS k2i
        FROM events WHERE event_type IN ('click', 'error')
    ),
    c AS (
        SELECT v, SUM(k1i) AS k1, SUM(k2i) AS k2 FROM d GROUP BY v
    ),
    f AS (
        SELECT SUM(k1) OVER (ORDER BY v) * 1.0 / SUM(k1) OVER () AS f1,
               SUM(k2) OVER (ORDER BY v) * 1.0 / SUM(k2) OVER () AS f2,
               CAST(SUM(k1) OVER () AS BIGINT) AS n1,
               CAST(SUM(k2) OVER () AS BIGINT) AS n2
        FROM c
    )
    SELECT n1, n2, ROUND(MAX(ABS(f1 - f2)) + 1e-9, 4) AS d_stat
    FROM f GROUP BY n1, n2
    """,
)
def events_value_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest`` for click vs error event
    values: exact two-sample KS distance from running empirical CDFs
    over the distinct-value count table (operators/stats.ks_2samp)."""
    ev = load_table(spark, sf_dir, "events")
    res = ks_2samp(
        ev,
        F.col("value"),
        F.col("event_type") == "click",
        F.col("event_type") == "error",
    )
    return res.select("n1", "n2", _r4(F.col("d_stat")).alias("d_stat"))


@register(
    "orders_priority_status_cramers_v",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    WITH cell AS (
        SELECT o_orderpriority AS a, o_orderstatus AS b,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS da,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS db
        FROM cell
    ),
    m AS (
        SELECT cell.o,
               ra.ra * cb.cb * 1.0 / tot.n AS e,
               tot.n, tot.da, tot.db
        FROM cell
        JOIN (SELECT a, SUM(o) AS ra FROM cell GROUP BY a) ra USING (a)
        JOIN (SELECT b, SUM(o) AS cb FROM cell GROUP BY b) cb USING (b)
        CROSS JOIN tot
    )
    SELECT n,
           -- sum(o^2/e) - n == full-table sum((o-e)^2/e) incl. empty cells
           ROUND(SUM(o * o / e) - n + 1e-9, 4) AS chi2,
           ROUND(SQRT((SUM(o * o / e) - n)
                      / (n * LEAST(da - 1, db - 1))) + 1e-9, 4) AS cramers_v
    FROM m GROUP BY n, da, db
    """,
)
def orders_priority_status_cramers_v(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``cramersV(o_orderpriority, o_orderstatus)``: is order
    urgency associated with fulfillment status?  Contingency cells are
    tiny next to the fact, so everything after the first groupBy is
    broadcast arithmetic (operators/stats.cramers_v)."""
    orders = load_table(spark, sf_dir, "orders")
    res = cramers_v(
        orders, F.col("o_orderpriority"), F.col("o_orderstatus")
    )
    return res.select(
        "n",
        _r4(F.col("chi2")).alias("chi2"),
        _r4(F.col("cramers_v")).alias("cramers_v"),
    )


@register(
    "orders_status_priority_theils_u",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    WITH cell AS (
        SELECT o_orderstatus AS x, o_orderpriority AS y,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM cell),
    hxy AS (
        SELECT -SUM((k * 1.0 / tot.n)
                    * LOG2(k * 1.0 / my.ky)) AS h
        FROM cell
        JOIN (SELECT y, SUM(k) AS ky FROM cell GROUP BY y) my USING (y)
        CROSS JOIN tot
    ),
    hx AS (
        SELECT -SUM((kx * 1.0 / tot.n) * LOG2(kx * 1.0 / tot.n)) AS h
        FROM (SELECT x, SUM(k) AS kx FROM cell GROUP BY x) mx
        CROSS JOIN tot
    )
    SELECT tot.n AS n,
           ROUND(hx.h + 1e-9, 4) AS h_x,
           ROUND((hx.h - hxy.h) / hx.h + 1e-9, 4) AS theils_u
    FROM tot CROSS JOIN hx CROSS JOIN hxy
    """,
)
def orders_status_priority_theils_u(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``theilsU(o_orderstatus, o_orderpriority)``: how much
    of the status entropy does knowing priority remove?  Same
    contingency-cell reduction as cramers_v, different functional
    (operators/stats.theils_u)."""
    orders = load_table(spark, sf_dir, "orders")
    res = theils_u(orders, F.col("o_orderstatus"), F.col("o_orderpriority"))
    return res.select(
        "n",
        _r4(F.col("h_x")).alias("h_x"),
        _r4(F.col("theils_u")).alias("theils_u"),
    )


@register(
    "events_value_time_linreg",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COVAR_POP(value, epoch(ts) / 86400.0)
                 / VAR_POP(epoch(ts) / 86400.0) + 1e-9, 4) AS slope,
           ROUND(AVG(value)
                 - COVAR_POP(value, epoch(ts) / 86400.0)
                   / VAR_POP(epoch(ts) / 86400.0)
                   * AVG(epoch(ts) / 86400.0) + 1e-9, 4) AS intercept,
           ROUND(POWER(CORR(epoch(ts) / 86400.0, value), 2) + 1e-9, 4)
               AS r2
    FROM events GROUP BY event_type
    """,
)
def events_value_time_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(toUnixTimestamp(ts), value)``
    per event type: the value-drift-over-time trend panel.  x is epoch
    DAYS (bounded magnitude keeps the slope in hash-rounding range);
    slope/intercept come from the engines' stable covar_pop/var_pop
    kernels (operators/stats.simple_linreg)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("ts").cast("double") / 86400.0
    res = simple_linreg(ev, x, F.col("value"), by=("event_type",))
    return res.select(
        "event_type",
        "n",
        _r4(F.col("slope")).alias("slope"),
        _r4(F.col("intercept")).alias("intercept"),
        _r4(F.col("r2")).alias("r2"),
    )


@register(
    "events_type_bounding_ratio",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    WITH b AS (
        SELECT event_type, MIN(ts) AS ts_min, MAX(ts) AS ts_max
        FROM events GROUP BY event_type
    ),
    yf AS (
        SELECT e.event_type, ARG_MIN(e.value, e.event_id) AS y_first
        FROM events e JOIN b ON e.event_type = b.event_type
                            AND e.ts = b.ts_min
        GROUP BY e.event_type
    ),
    yl AS (
        SELECT e.event_type, ARG_MAX(e.value, e.event_id) AS y_last
        FROM events e JOIN b ON e.event_type = b.event_type
                            AND e.ts = b.ts_max
        GROUP BY e.event_type
    )
    SELECT b.event_type,
           ROUND(epoch(b.ts_min) / 86400.0 + 1e-9, 4) AS x_min,
           ROUND(epoch(b.ts_max) / 86400.0 + 1e-9, 4) AS x_max,
           ROUND((yl.y_last - yf.y_first)
                 / (epoch(b.ts_max) / 86400.0 - epoch(b.ts_min) / 86400.0)
                 + 1e-9, 4) AS bounding_ratio
    FROM b JOIN yf ON b.event_type = yf.event_type
           JOIN yl ON b.event_type = yl.event_type
    """,
)
def events_type_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio(ts, value)`` per event type: the slope
    between each series' first and last point.  Boundary ties are pinned
    by event_id on BOTH engines (min event_id wins at the left edge, max
    at the right — the as-of tie lesson from the r11 skew sweep applied
    up front); Spark side is one min_by/max_by aggregation, the oracle
    reads the same rows through boundary-timestamp joins because DuckDB's
    arg_min/arg_max take only scalar orderings
    (operators/stats.bounding_ratio)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("ts").cast("double") / 86400.0
    # min(struct(x, id)) takes the smallest id at the smallest x and
    # max(struct(x, id)) the largest id at the largest x — exactly the
    # boundary the oracle's two filtered arg_min/arg_max joins read.
    res = bounding_ratio(
        ev, x, F.col("value"), F.col("event_id"), by=("event_type",)
    )
    return res.select(
        "event_type",
        _r4(F.col("x_min")).alias("x_min"),
        _r4(F.col("x_max")).alias("x_max"),
        _r4(F.col("bounding_ratio")).alias("bounding_ratio"),
    )


@register(
    "events_value_pop_moments",
    tags=("clickhouse-surface", "stats", "A-ext"),
    oracle="""
    WITH mu AS (
        SELECT event_type, AVG(value) AS m FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SQRT(AVG(POWER(e.value - mu.m, 2))) + 1e-9, 4)
               AS stddev_pop,
           ROUND(AVG(POWER(e.value - mu.m, 3))
                 / POWER(AVG(POWER(e.value - mu.m, 2)), 1.5) + 1e-9, 4)
               AS skew_pop,
           ROUND(AVG(POWER(e.value - mu.m, 4))
                 / POWER(AVG(POWER(e.value - mu.m, 2)), 2) + 1e-9, 4)
               AS kurt_pop
    FROM events e JOIN mu ON e.event_type = mu.event_type
    GROUP BY e.event_type
    """,
)
def events_value_pop_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop(value)`` / ``kurtPop(value)`` per event
    type, via two-pass central moments (identical arithmetic on both
    engines — the builtins differ on sample-vs-population definitions,
    so neither engine's shortcut is used; operators/stats.pop_moments).
    The second pass joins the per-group mean back broadcast-style."""
    ev = load_table(spark, sf_dir, "events")
    res = pop_moments(ev, F.col("value"), by=("event_type",))
    return res.select(
        "event_type",
        "n",
        _r4(F.col("stddev_pop")).alias("stddev_pop"),
        _r4(F.col("skew_pop")).alias("skew_pop"),
        _r4(F.col("kurt_pop")).alias("kurt_pop"),
    )
