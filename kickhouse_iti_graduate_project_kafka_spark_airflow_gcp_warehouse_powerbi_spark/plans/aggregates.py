"""Aggregate-combinator and quantile surface of the ClickHouse warehouse.

ClickHouse's hallmark aggregate spellings that the reference BI layer
leans on and that are not yet named by other catalog queries:

- the ``-If`` combinator family (``countIf`` / ``sumIf`` / ``avgIf`` /
  ``minIf`` / ``maxIf`` / ``uniqExactIf``) — conditional aggregation
  without a pre-filter, so one pass feeds many differently-filtered
  aggregates;
- ``groupBitAnd`` / ``groupBitOr`` / ``groupBitXor``;
- ``avgWeighted``;
- ``quantilesExact`` (multi-level exact quantiles);
- ``quantileTDigest``-style approximate quantiles with a verifiable
  rank-error contract (Spark's ``percentile_approx`` sketch stands in;
  the query materializes the rank-error INVARIANT as its result so the
  oracle row is a real at-scale check, the repo's
  ``*_equals_bruteforce`` companion pattern).

All Spark-side spellings are single conditional aggregations — the -If
family is exactly what Catalyst's partial aggregation loves: one
exchange, map-side combine, no pre-filter scans repeated per condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.tables import load_table

#: the -If condition every combinator below shares
_HI_VAL = 100.0


def _dec4_strings(col) -> "F.Column":
    """Canonical per-element string form of an ``array<double>``: the
    repo-wide hash convention (``round(x + 1e-9, 4)``) followed by a
    ``decimal(18,4)`` cast so BOTH engines print the identical
    fixed-scale text (double→string formatting differs between Spark
    and DuckDB; decimal→string does not).  Used by the array/map
    queries that must serialize numeric arrays as scalar strings for
    the driver's pandas canonicalizer."""
    return F.transform(
        col,
        lambda x: F.round(x + F.lit(1e-9), 4)
        .cast("decimal(18,4)")
        .cast("string"),
    )


#: the matching DuckDB spelling of one element (``{v}`` = value expr)
_DEC4_SQL = "CAST(CAST(ROUND({v} + 1e-9, 4) AS DECIMAL(18,4)) AS VARCHAR)"


@register(
    "events_if_combinator_suite",
    tags=("clickhouse-surface", "A-ext", "combinator"),
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value > {_HI_VAL}) AS BIGINT)
               AS cnt_hi,
           ROUND(COALESCE(SUM(value) FILTER (WHERE value > {_HI_VAL}), 0)
                 + 1e-9, 4) AS sum_hi,
           ROUND(AVG(value) FILTER (WHERE value > {_HI_VAL}) + 1e-9, 4)
               AS avg_hi,
           MIN(value) FILTER (WHERE value > {_HI_VAL}) AS min_hi,
           MAX(value) FILTER (WHERE value > {_HI_VAL}) AS max_hi,
           CAST(COUNT(DISTINCT user_id)
                    FILTER (WHERE value > {_HI_VAL}) AS BIGINT)
               AS uniq_users_hi
    FROM events GROUP BY event_type
    """,
)
def events_if_combinator_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-If`` combinator family in one pass per event type:
    ``countIf / sumIf / avgIf / minIf / maxIf / uniqExactIf`` with a
    shared high-value predicate.  Spark spelling: ``F.when`` inside each
    aggregate — one exchange, no repeated filtered scans (the reason the
    combinator exists in ClickHouse).  min/max are exact value picks and
    need no hash rounding; the double sum/avg follow the 4dp discipline."""
    ev = load_table(spark, sf_dir, "events")
    hi = F.when(F.col("value") > _HI_VAL, F.col("value"))
    hi_user = F.when(F.col("value") > _HI_VAL, F.col("user_id"))
    return ev.groupBy("event_type").agg(
        F.count(hi).alias("cnt_hi"),
        F.round(F.coalesce(F.sum(hi), F.lit(0.0)) + F.lit(1e-9), 4).alias(
            "sum_hi"
        ),
        F.round(F.avg(hi) + F.lit(1e-9), 4).alias("avg_hi"),
        F.min(hi).alias("min_hi"),
        F.max(hi).alias("max_hi"),
        F.countDistinct(hi_user).alias("uniq_users_hi"),
    )


@register(
    "orders_bit_aggregates",
    tags=("clickhouse-surface", "A-ext", "combinator"),
    oracle="""
    SELECT o_orderstatus,
           BIT_AND(o_orderkey) AS key_bit_and,
           BIT_OR(o_orderkey) AS key_bit_or,
           BIT_XOR(o_orderkey) AS key_bit_xor,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def orders_bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd / groupBitOr / groupBitXor`` over the
    order keys per status — the bitmask rollups ClickHouse uses for
    flag-column compaction.  Pure integer lattice aggregates: fully
    associative/commutative, so map-side combine carries them at any
    scale, and results are exact (no float discipline needed)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_bit_and"),
        F.bit_or("o_orderkey").alias("key_bit_or"),
        F.bit_xor("o_orderkey").alias("key_bit_xor"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "lineitem_avg_weighted",
    tags=("clickhouse-surface", "A-ext", "combinator"),
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity)
                 + 1e-9, 4) AS avg_price_weighted,
           ROUND(SUM(l_quantity) + 1e-9, 4) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_avg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``avgWeighted(l_extendedprice, l_quantity)`` per
    return flag: quantity-weighted mean price.  One exchange; the ratio
    of two map-side-combined sums (scale-free output under the 4dp hash
    discipline — the raw sums never surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity")
            + F.lit(1e-9),
            4,
        ).alias("avg_price_weighted"),
        F.round(F.sum("l_quantity") + F.lit(1e-9), 4).alias("total_qty"),
    )


_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


@register(
    "events_quantiles_exact",
    bench=True,
    tags=("clickhouse-surface", "A-ext", "quantile"),
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.25) + 1e-9, 4) AS p25,
           ROUND(quantile_cont(value, 0.50) + 1e-9, 4) AS p50,
           ROUND(quantile_cont(value, 0.75) + 1e-9, 4) AS p75,
           ROUND(quantile_cont(value, 0.90) + 1e-9, 4) AS p90,
           ROUND(quantile_cont(value, 0.99) + 1e-9, 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def events_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantilesExact(0.25,…,0.99)(value)`` per event type.
    Both engines use the R-7 linearly-interpolated definition (Spark
    ``percentile``, DuckDB ``quantile_cont``), so values agree to float
    ulps and the 4dp discipline closes them.  Exact quantiles sort
    within the aggregation — per-group cost is the group's row count;
    the approximate sibling below is the 100 TB path."""
    ev = load_table(spark, sf_dir, "events")
    # ONE percentile aggregate over the percentage array, not one per
    # quantile: each partial_percentile buffer is a full per-group
    # value-count map, so N separate calls shuffle and merge N identical
    # maps (guide §2.3 — shuffle fewer bytes). The array form computes
    # the same R-7 values from a single buffer; elements are projected
    # back out, so the output schema (scalar p25..p99) is unchanged.
    qarr = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", F.array(*[F.lit(q) for q in _QS])).alias("_qs"),
    )
    return qarr.select(
        "event_type",
        "n",
        *[
            F.round(F.col("_qs").getItem(i) + F.lit(1e-9), 4).alias(
                f"p{int(q * 100)}"
            )
            for i, q in enumerate(_QS)
        ],
    )


#: percentile_approx accuracy knob: guaranteed rank error <= n/accuracy
_TDIGEST_ACC = 1000


@register(
    "events_quantile_sketch_rank_invariant",
    tags=("clickhouse-surface", "A-ext", "quantile", "sketch"),
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok
    FROM events GROUP BY event_type
    """,
)
def events_quantile_sketch_rank_invariant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``quantileTDigest``-class sketch with its contract
    MATERIALIZED: Spark's ``percentile_approx`` (a GK/QuantileSummaries
    sketch — mergeable, bounded memory, the quantile you actually run on
    100 TB) guarantees rank error <= n/accuracy.  The query computes the
    approximate p50/p90 per event type, then counts how many values fall
    strictly below / at each approximation in the SAME pass shape, and
    returns 1 only when the target rank lies within the guaranteed
    error band of the approximation's true rank interval.  The oracle
    pins the contract (all 1s) — the repo's invariant-companion pattern
    for sketch operators whose exact output is implementation-defined."""
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", F.lit(0.5), F.lit(_TDIGEST_ACC)).alias(
            "_a50"
        ),
        F.percentile_approx("value", F.lit(0.9), F.lit(_TDIGEST_ACC)).alias(
            "_a90"
        ),
    )
    ranked = (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.count(F.when(F.col("value") < F.col("_a50"), 1)).alias("_lt50"),
            F.count(F.when(F.col("value") <= F.col("_a50"), 1)).alias("_le50"),
            F.count(F.when(F.col("value") < F.col("_a90"), 1)).alias("_lt90"),
            F.count(F.when(F.col("value") <= F.col("_a90"), 1)).alias("_le90"),
        )
    )
    err = (F.col("n") / _TDIGEST_ACC) + 1  # +1 absorbs rank-convention off-by-one
    def ok(target, lt, le):
        lo, hi = target - err, target + err
        # the approx value's true rank is anywhere in [lt, le]; pass if
        # that interval intersects the allowed band
        return (
            (F.col(le) >= lo) & (F.col(lt) <= hi)
        ).cast("long")
    return ranked.select(
        "event_type",
        "n",
        ok(0.5 * F.col("n"), "_lt50", "_le50").alias("p50_ok"),
        ok(0.9 * F.col("n"), "_lt90", "_le90").alias("p90_ok"),
    )


@register(
    "lineitem_summap_qty",
    bench=True,
    tags=("clickhouse-surface", "A-ext", "map-agg"),
    oracle="""
    WITH b AS (
        SELECT l_linestatus,
               [l_returnflag, 'ALL'] AS ks,
               [l_quantity, l_quantity] AS vs
        FROM lineitem
    ),
    e AS (SELECT l_linestatus, unnest(ks) AS k, unnest(vs) AS v FROM b),
    p AS (SELECT l_linestatus, k, SUM(v) AS c FROM e GROUP BY 1, 2)
    SELECT l_linestatus,
           string_agg(k, ',' ORDER BY k) AS map_keys,
           string_agg(CAST(CAST(c AS BIGINT) AS VARCHAR), ',' ORDER BY k)
               AS map_values
    FROM p GROUP BY l_linestatus
    """,
)
def lineitem_summap_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap([l_returnflag, 'ALL'], [qty, qty])`` per line
    status: per-key summed quantity plus a rolled-up 'ALL' key in the
    same map — the counter-map idiom ClickHouse dashboards aggregate
    with the -Map combinator.  Distributed spelling: explode + hash
    aggregation on (group, key) + aligned-array reassembly
    (operators/maps.agg_map).  Quantities are integral doubles, so the
    per-key sums are exact and need no hash rounding.  The aligned
    arrays are serialized as comma-joined scalar strings — the driver's
    canonicalizer (pandas sort over every output column) cannot hash
    list cells, so array/map results leave the catalog as their
    canonical string form (the array order is already pinned)."""
    from ..operators.maps import agg_map

    m = agg_map(
        load_table(spark, sf_dir, "lineitem"),
        F.array(F.col("l_returnflag"), F.lit("ALL")),
        F.array(F.col("l_quantity"), F.col("l_quantity")),
        by=("l_linestatus",),
        combine="sum",
    )
    return m.select(
        "l_linestatus",
        F.array_join("map_keys", ",").alias("map_keys"),
        F.array_join(
            F.col("map_values").cast("array<long>").cast("array<string>"), ","
        ).alias("map_values"),
    )


@register(
    "events_minmax_map_by_type",
    tags=("clickhouse-surface", "A-ext", "map-agg"),
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 4 AS VARCHAR)
                   AS k,
               value AS v
        FROM events
    ),
    p AS (
        SELECT event_type, k, MIN(v) AS mn, MAX(v) AS mx
        FROM b GROUP BY 1, 2
    )
    SELECT event_type,
           string_agg(k, ',' ORDER BY k) AS map_keys,
           string_agg(""" + _DEC4_SQL.format(v="mn") + """, ',' ORDER BY k)
               AS min_values,
           string_agg(""" + _DEC4_SQL.format(v="mx") + """, ',' ORDER BY k)
               AS max_values
    FROM p GROUP BY event_type
    """,
)
def events_minmax_map_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap`` per event type, keyed by an
    hour-of-epoch phase bucket: per-key extreme values re-assembled as
    aligned sorted arrays.  Two agg_map passes (min and max) joined on
    the group key — min/max pick exact stored doubles, so no rounding.
    The epoch-hour bucket is integer arithmetic (session-timezone-proof,
    the repo's epoch-day idiom)."""
    from ..operators.maps import agg_map

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        ((F.col("ts").cast("double") / 3600).cast("long") % 4)
        .cast("string")
        .alias("k"),
        F.col("value").alias("v"),
    )
    mn = agg_map(
        keyed, F.array("k"), F.array("v"), by=("event_type",), combine="min"
    ).withColumnRenamed("map_values", "min_values")
    mx = agg_map(
        keyed, F.array("k"), F.array("v"), by=("event_type",), combine="max"
    ).select("event_type", F.col("map_values").alias("max_values"))
    return mn.join(mx, "event_type").select(
        "event_type",
        F.array_join("map_keys", ",").alias("map_keys"),
        F.array_join(_dec4_strings(F.col("min_values")), ",").alias(
            "min_values"
        ),
        F.array_join(_dec4_strings(F.col("max_values")), ",").alias(
            "max_values"
        ),
    )


@register(
    "events_topk_types_per_user",
    tags=("clickhouse-surface", "A-ext", "topk"),
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rk
        FROM c
    )
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY rk) AS top_types,
           string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY rk) AS top_counts
    FROM r WHERE rk <= 3 GROUP BY user_id
    """,
)
def events_topk_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK(3)(event_type)`` per user, made DETERMINISTIC:
    ClickHouse's topK is a SpaceSaving sketch with unspecified tie
    order; this exact spelling counts per (user, type), ranks by
    (count desc, type) — a pinned total order, the repo's tie-break
    discipline — and keeps 3.  The ranking window partitions by user
    over the per-type count table, so its per-task bound is types per
    user (single digits), not events per user."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    r = c.select(
        "user_id", "event_type", "cnt", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= 3)
    pairs = r.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("rk", "event_type", "cnt"))
        ).alias("_p")
    )
    return pairs.select(
        "user_id",
        F.array_join(
            F.transform("_p", lambda p: p["event_type"]), ","
        ).alias("top_types"),
        F.array_join(
            F.transform("_p", lambda p: p["cnt"].cast("string")), ","
        ).alias("top_counts"),
    )


@register(
    "user_event_type_arrays",
    tags=("clickhouse-surface", "A-ext", "group-array"),
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type)
               AS uniq_types,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def user_event_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupUniqArray(event_type)`` per user (sorted for
    the cross-engine hash — ClickHouse's own array order is arena-
    dependent, the same unspecified-order hazard topK has).  Spark:
    ``collect_set`` + ``sort_array``, one user-keyed exchange with
    map-side partial sets."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("uniq_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "event_type_audience_overlap",
    tags=("clickhouse-surface", "A-ext", "bitmap"),
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY event_type),
    i AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM d a JOIN d b ON a.user_id = b.user_id
        WHERE a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_common,
           sa.n + sb.n - i.n_common AS n_union,
           ROUND(i.n_common * 1.0 / (sa.n + sb.n - i.n_common) + 1e-9, 4)
               AS jaccard
    FROM i JOIN s sa ON i.type_a = sa.event_type
           JOIN s sb ON i.type_b = sb.event_type
    """,
)
def event_type_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``bitmapAndCardinality`` / ``bitmapOrCardinality``
    audience overlap: for every pair of event types, the exact number of
    shared users, the union size (inclusion–exclusion), and the audience
    jaccard.  ClickHouse materializes roaring bitmaps per group and
    intersects them in one arena; the distributed spelling is a distinct
    (type, user) reduction self-joined on user — the join key is the
    user, so co-grouping shuffles each user's type-set once and pair
    counts combine map-side.  Per-user work is quadratic in the types
    that user touches (single digits here; a capped-types guard would
    precede this at 100 TB for pathological keys)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    s = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    i = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = s.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("_na")
    )
    sb = s.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("_nb")
    )
    out = i.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    union = F.col("_na") + F.col("_nb") - F.col("n_common")
    return out.select(
        "type_a",
        "type_b",
        "n_common",
        union.alias("n_union"),
        F.round(F.col("n_common") / union + F.lit(1e-9), 4).alias("jaccard"),
    )


@register(
    "events_daily_type_pivot",
    tags=("clickhouse-surface", "A-ext", "pivot"),
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day_epoch,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS view,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
               AS signup
    FROM events GROUP BY 1
    """,
)
def events_daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI cross-tab: daily event counts PIVOTed to one column per
    event type — Spark's ``groupBy().pivot(values=...)`` relational
    operator with the value list pinned (pinning skips the extra
    distinct-scan job AND fixes the output schema, which an oracle needs
    anyway).  Catalyst compiles this to exactly the oracle's spelling:
    one hash aggregation with N conditional counts, map-side combined —
    a pivot over K values is never K passes.  Day bucketing is integer
    epoch-day arithmetic (timezone-proof)."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.col("ts").cast("double") / 86400).cast("long").alias("day_epoch")
    types = ["click", "view", "purchase", "error", "signup"]
    out = (
        ev.select(day, "event_type")
        .groupBy("day_epoch")
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves absent combinations NULL; the cross-tab contract is 0
    return out.select(
        "day_epoch",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@register(
    "orders_measures_unpivot",
    tags=("clickhouse-surface", "A-ext", "pivot"),
    oracle="""
    SELECT o_orderkey, measure, ROUND(val + 1e-9, 4) AS val
    FROM (
        SELECT o_orderkey, 'total_price' AS measure, o_totalprice AS val
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'days_since_95',
               CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS DOUBLE)
        FROM orders
    ) u
    """,
)
def orders_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse cross-tab: wide measure columns melted to
    (key, measure, value) rows with Spark's ``unpivot`` (SQL UNPIVOT /
    pandas melt) — the shape BI tools want for generic measure pickers.
    A generator projection (one scan, no shuffle, no join); the date
    measure uses day arithmetic on a DATE cast (NTZ-safe, the repo's
    datetime-suite idiom)."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("total_price"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("double")
        .alias("days_since_95"),
    )
    melted = wide.unpivot(
        ids="o_orderkey",
        values=["total_price", "days_since_95"],
        variableColumnName="measure",
        valueColumnName="_v",
    )
    return melted.select(
        "o_orderkey",
        "measure",
        F.round(F.col("_v") + F.lit(1e-9), 4).alias("val"),
    )


@register(
    "orders_distinct_mode_suite",
    tags=("clickhouse-surface", "A-ext", "combinator"),
    oracle="""
    WITH pc AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY COUNT(*) DESC, o_orderpriority)
                   AS rk
        FROM orders GROUP BY 1, 2
    ),
    s AS (
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)
                   AS uniq_prices,
               CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_distinct_price
        FROM orders GROUP BY o_orderstatus
    )
    SELECT s.o_orderstatus, s.uniq_prices, s.sum_distinct_price,
           pc.o_orderpriority AS mode_priority, pc.cnt AS mode_count
    FROM s JOIN pc ON s.o_orderstatus = pc.o_orderstatus AND pc.rk = 1
    """,
)
def orders_distinct_mode_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqExact`` / ``sumDistinct`` / ``mode`` (topK(1)
    exact) per order status.  The distinct money sum goes through the
    repo's exact-decimal discipline (DECIMAL(18,2) accumulate, double
    cast at the end — a raw double distinct-sum is summation-order
    dependent at ~1e-3 absolute here, far outside hash rounding).  The
    mode pins ties to the smallest priority string via a (count desc,
    value) total order — ClickHouse's own mode/topK tie order is
    arena-dependent.  Two fact-pass aggregations + a tiny broadcast
    join."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_totalprice").alias("uniq_prices"),
        F.sum_distinct(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_distinct_price"),
    )
    pc = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    mode = (
        pc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )
    return s.join(F.broadcast(mode), "o_orderstatus")


@register(
    "events_topk_weighted_types",
    tags=("clickhouse-surface", "A-ext", "topk"),
    oracle="""
    WITH c AS (
        SELECT user_id, event_type,
               ROUND(SUM(value) + 1e-9, 4) AS w
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT user_id, event_type, w,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY w DESC, event_type) AS rk
        FROM c
    )
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY rk) AS top_types,
           string_agg(CAST(CAST(w AS DECIMAL(18,4)) AS VARCHAR),
                      ',' ORDER BY rk) AS top_weights
    FROM r WHERE rk <= 2 GROUP BY user_id
    """,
)
def events_topk_weighted_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(2)(event_type, value)`` per user, made
    deterministic the same way as ``events_topk_types_per_user``: weights
    are per-(user,type) value sums (hash-rounded BEFORE ranking so both
    engines rank identical weights — ranking raw double sums would let a
    1-ulp summation difference flip an order), ranked by (weight desc,
    type).  Same bounded-window shape: types per user, not events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.round(F.sum("value") + F.lit(1e-9), 4).alias("w")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("w").desc(), F.col("event_type")
    )
    r = c.select(
        "user_id", "event_type", "w", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= 2)
    pairs = r.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("rk", "event_type", "w"))).alias(
            "_p"
        )
    )
    return pairs.select(
        "user_id",
        F.array_join(
            F.transform("_p", lambda p: p["event_type"]), ","
        ).alias("top_types"),
        F.array_join(
            F.transform(
                "_p",
                lambda p: p["w"].cast("decimal(18,4)").cast("string"),
            ),
            ",",
        ).alias("top_weights"),
    )


@register(
    "orders_argminmax_if",
    tags=("clickhouse-surface", "A-ext", "combinator"),
    oracle="""
    WITH u AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    ext AS (
        SELECT o_orderstatus,
               MAX(o_totalprice) AS _maxp,
               MIN(o_totalprice) AS _minp
        FROM u GROUP BY o_orderstatus
    ),
    hi AS (
        SELECT u.o_orderstatus, MIN(u.o_orderkey) AS priciest_urgent_key
        FROM u JOIN ext ON u.o_orderstatus = ext.o_orderstatus
                       AND u.o_totalprice = ext._maxp
        GROUP BY u.o_orderstatus
    ),
    lo AS (
        SELECT u.o_orderstatus, MIN(u.o_orderkey) AS cheapest_urgent_key
        FROM u JOIN ext ON u.o_orderstatus = ext.o_orderstatus
                       AND u.o_totalprice = ext._minp
        GROUP BY u.o_orderstatus
    ),
    base AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority IN
                   ('1-URGENT', '2-HIGH')) AS BIGINT) AS n_urgent
        FROM orders GROUP BY o_orderstatus
    )
    SELECT base.o_orderstatus, hi.priciest_urgent_key,
           lo.cheapest_urgent_key, base.n_urgent
    FROM base
    LEFT JOIN hi ON base.o_orderstatus = hi.o_orderstatus
    LEFT JOIN lo ON base.o_orderstatus = lo.o_orderstatus
    """,
)
def orders_argminmax_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMaxIf`` / ``argMinIf``: the order key carrying the
    extreme price among urgent orders only, per status, with price ties
    pinned to the SMALLEST key — a genuine total order.  Spark compares
    ``(price, -key)`` / ``(price, key)`` as a STRUCT inside
    ``max_by``/``min_by`` (lexicographic struct comparison is exact —
    no composite-scalar encoding, which a prior revision attempted with
    a 17-bit modular tie term that collided for keys congruent mod 2^17;
    advisor-caught).  DuckDB's arg_min/arg_max take only scalar
    orderings, so the oracle spells the same total order as a two-level
    extreme: per-group extreme price first, then MIN(key) among its
    carriers."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    hi_key = F.when(
        urgent,
        F.struct(
            F.col("o_totalprice").alias("p"),
            (-F.col("o_orderkey")).alias("k"),
        ),
    )
    lo_key = F.when(
        urgent,
        F.struct(
            F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
        ),
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", hi_key).alias("priciest_urgent_key"),
        F.min_by("o_orderkey", lo_key).alias("cheapest_urgent_key"),
        F.count(F.when(urgent, 1)).alias("n_urgent"),
    )
