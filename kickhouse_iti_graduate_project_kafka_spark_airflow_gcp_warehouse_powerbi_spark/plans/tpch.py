"""TPC-H-flavored OLAP plans over the fixture star schema.

Covers the reference's aggregation / join / sort / set-op surface
(SURVEY.md §2.4 J1-J6, §2.5 A1-A11, §2.6 WF1-WF2, §2.7 O1-O4) on the
driver fixtures. Beyond the reference we also expose rollup/cube — free in
Spark, noted as zero-cost extensions in SURVEY.md §2.5.

Numeric policy: money columns are clean 2-decimal data, so every money
aggregate goes through ``decimal_sum`` (exact integer arithmetic, cast back
to double). Results are bitwise-deterministic under any partitioning —
reproducible at cluster scale and directly hash-comparable with the DuckDB
oracle without rounding fudge. Averages divide an exact sum by an exact
count (single IEEE division). Integer-valued window averages are exact for
the same reason.

Scale notes (100 TB posture):
- dim joins are explicitly ``broadcast()``; fact-to-fact joins shuffle on
  their keys and AQE picks the final strategy;
- aggregations are single groupBy chains → Catalyst plans map-side partial
  aggregation;
- windowed plans partition by high-cardinality keys; no global windows;
- top-k = orderBy+limit → TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.expressions import decimal_avg, decimal_sum
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: exact decimal revenue term: extendedprice * (1 - discount), both clean 2dp
def _revenue_dec() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(14,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


# --------------------------------------------------------------------------
# A1/A3/A4-family: grouped aggregation with arithmetic (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    bench=True,
    tags=("A1", "A3", "A4", "O1"),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_REVENUE_SQL} *
                    (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))),
                2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): one wide groupBy with
    map-side partial aggregation; the shipdate filter pushes to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    rev = _revenue_dec()
    charge = rev * (F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity", 2, 14).alias("sum_qty"),
            decimal_sum("l_extendedprice", 2, 14).alias("sum_base_price"),
            F.sum(rev).cast("decimal(38,2)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,2)").cast("double").alias("sum_charge"),
            decimal_avg("l_quantity", 2, 14).alias("avg_qty"),
            decimal_avg("l_extendedprice", 2, 14).alias("avg_price"),
            decimal_avg("l_discount", 2, 14).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J5-family: star-schema joins (broadcast dims), grouped revenue
# --------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    bench=True,
    tags=("J5", "A1", "A8"),
    oracle=f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema revenue rollup, the flagship query. Mirrors the Power BI
    dims->facts relationships (reference: README.md:437, 462-466).
    orders/customer are fact-sized at 100 TB — shuffle join + AQE;
    nation/region are true dims — always broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# A9 top-K + deterministic total-order limit
# --------------------------------------------------------------------------
@register(
    "top_customers_by_revenue",
    tags=("A9", "J5", "O1", "O2"),
    oracle=f"""
    SELECT c.c_custkey AS custkey, ANY_VALUE(c.c_name) AS name,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    ORDER BY revenue DESC, custkey ASC
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K by aggregate (reference: notebook query_7 'ORDER BY occurrences
    DESC LIMIT 10'). Revenue is exact-decimal, so the (revenue, custkey)
    sort is a true total order — the LIMIT cut is deterministic. Executes as
    TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.any_value(F.col("c_name")).alias("name"),
            F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# A1 plain count by key
# --------------------------------------------------------------------------
@register(
    "order_priority_count",
    tags=("A1",),
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) GROUP BY k — the bread-and-butter aggregate (reference:
    notebook query_1 'messages per topic')."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# A4 AVG + broadcast dim join
# --------------------------------------------------------------------------
@register(
    "avg_acctbal_by_segment_nation",
    tags=("A4", "J5"),
    oracle="""
    SELECT c.c_mktsegment AS segment, n.n_name AS nation,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal,
           COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_mktsegment, n.n_name
    """,
)
def avg_acctbal_by_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG per group through a broadcast dim join (reference: notebook
    query_4 AVG(LENGTH(message)) shape)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("n_name").alias("nation"))
        .agg(
            decimal_avg("c_acctbal", 2, 14).alias("avg_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


# --------------------------------------------------------------------------
# min/max/count sanity totals (A10) — single global aggregate
# --------------------------------------------------------------------------
@register(
    "global_sanity_counts",
    tags=("A10",),
    oracle="""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers_with_orders,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total_value
    FROM orders
    """,
)
def global_sanity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global COUNT(*) sanity totals (reference: README.md:446-450 post-deploy
    verification SQL; grafana query 3)."""
    return _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers_with_orders"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        decimal_sum("o_totalprice", 2, 16).alias("total_value"),
    )


# --------------------------------------------------------------------------
# A11 DISTINCT projection
# --------------------------------------------------------------------------
@register(
    "distinct_segments",
    tags=("A11",),
    oracle="SELECT DISTINCT c_mktsegment AS segment FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (reference: README.md:459 soccer-only check
    'SELECT DISTINCT lowerUTF8(trim(strSport))')."""
    return _t(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("segment")).distinct()


# --------------------------------------------------------------------------
# O1/O2/O4: IN-list filter + multi-key deterministic sort + limit
# --------------------------------------------------------------------------
@register(
    "urgent_orders_window",
    tags=("O1", "O2", "O4"),
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderdate AS orderdate,
           o_orderpriority AS priority, o_totalprice AS totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate >= TIMESTAMP '1998-01-01'
    ORDER BY o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def urgent_orders_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (reference: grafana query 7 strStatus IN (...)) with a
    total-order multi-key sort + LIMIT; both predicates push down to the
    scan."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .orderBy("orderdate", "orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# O3: union-by-name with missing-column tolerance
# --------------------------------------------------------------------------
@register(
    "union_by_name_mixed",
    tags=("O3",),
    oracle="""
    WITH u AS (
        SELECT l_orderkey AS k, l_extendedprice AS amount,
               'lineitem' AS src, NULL AS priority
        FROM lineitem
        UNION ALL BY NAME
        SELECT o_orderkey AS k, o_totalprice AS amount,
               'orders' AS src, o_orderpriority AS priority
        FROM orders
    )
    SELECT src, COUNT(*) AS n,
           CAST(SUM(CAST(amount AS DECIMAL(16,2))) AS DOUBLE) AS total,
           COUNT(priority) AS n_with_priority
    FROM u GROUP BY src
    """,
)
def union_by_name_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) — the reference folds 27
    heterogeneous frames this way (reference: validate_json.py:643-652).
    The column present on only one side ('priority') null-fills on the other."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_extendedprice").alias("amount"),
        F.lit("lineitem").alias("src"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amount"),
        F.lit("orders").alias("src"),
        F.col("o_orderpriority").alias("priority"),
    )
    return (
        li.unionByName(orders, allowMissingColumns=True)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum("amount", 2, 16).alias("total"),
            F.count("priority").alias("n_with_priority"),
        )
    )


# --------------------------------------------------------------------------
# rollup / cube — zero-cost extensions beyond the reference (SURVEY §2.5)
# --------------------------------------------------------------------------
@register(
    "rollup_order_counts",
    tags=("A1", "extension"),
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals in one pass (Spark expands to
    grouping sets; one shuffle)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup(F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum("o_totalprice", 2, 16).alias("total"),
        )
    )


@register(
    "cube_part_counts",
    tags=("A1", "extension"),
    oracle="""
    SELECT p_brand AS brand, p_size AS size, COUNT(*) AS n
    FROM part GROUP BY CUBE (p_brand, p_size)
    """,
)
def cube_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (brand, size)."""
    return (
        _t(spark, sf_dir, "part")
        .cube(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "rollup_grouping_id",
    tags=("A1", "extension", "rollup"),
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the GROUPING_ID discriminator — how a BI layer tells a
    subtotal row's NULL apart from a NULL data value (sentinel-coalesce,
    the docs_grouping_sets_counts approach, breaks when 'ALL' is a real
    value). Same single Expand+shuffle plan as plain rollup; gid is just
    a literal per grouping set."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "region_nations_listagg",
    tags=("A1", "extension", "listagg"),
    oracle="""
    SELECT r_name AS region,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_nations_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG / string_agg — the BI 'member list in a tooltip'
    shape. collect_list is unordered in a distributed agg (whichever
    partition arrives first), so determinism comes from array_sort BEFORE
    array_join — the aggregation itself stays a single partial-merge
    shuffle; no window, no global sort. Nation is dim-sized, so the join
    side broadcasts."""
    return (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# WF1: moving average with a row frame
# --------------------------------------------------------------------------
@register(
    "moving_avg_daily_orders",
    bench=True,
    tags=("WF1", "A2"),
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
    )
    SELECT priority, day, n_orders,
           AVG(n_orders) OVER (
               PARTITION BY priority ORDER BY day
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS mov_avg
    FROM daily
    """,
)
def moving_avg_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average with ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
    (reference: notebook query_10 6-hour smoothing of invalid ratio).
    Integer inputs → the sliding sum is exact, so no rounding is needed.
    Partitioned by priority so window state distributes."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("priority").orderBy("day").rowsBetween(-5, 0)
    return daily.withColumn("mov_avg", F.avg("n_orders").over(w))


# --------------------------------------------------------------------------
# WF2/A6: latest-row-per-key via window dedup (ReplacingMergeTree semantics)
# --------------------------------------------------------------------------
@register(
    "latest_order_per_customer",
    bench=True,
    tags=("WF2", "A6"),
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_orderdate AS orderdate, o_orderstatus AS status
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key view — our ReplacingMergeTree equivalent (reference:
    ClickHouse DDL 37/57/73/89/100/143 + argMax hub view DDL 447-470).
    One window pass (single shuffle) returns all columns of the newest row,
    vs 16 separate max_by aggregates. Tie-broken on orderkey so it is
    deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderstatus").alias("status"),
        )
    )


# --------------------------------------------------------------------------
# A5: argMax-style latest-state per key (max_by)
# --------------------------------------------------------------------------
@register(
    "latest_event_per_user",
    tags=("A5",),
    oracle="""
    SELECT user_id,
           ARG_MAX(event_type, ts) AS last_type,
           ARG_MAX(value, ts) AS last_value,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMax(col, ts) per key — the hub-view finalization pattern
    (reference: ClickHouse DDL 447-470 v_fact_event_latest). (user_id, ts)
    is unique in the fixture so max_by is deterministic."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", "ts").alias("last_type"),
            F.max_by("value", "ts").alias("last_value"),
            F.max("ts").alias("last_ts"),
        )
    )


# --------------------------------------------------------------------------
# Fact-to-fact joins (TPC-H Q3/Q12 shapes): lineitem ⋈ orders are BOTH huge
# at 100 TB — no broadcast; shuffle (sort-merge) join on the order key with
# AQE choosing the physical strategy and handling skew. These complement the
# star joins above, which only exercise broadcast dims.
# --------------------------------------------------------------------------
@register(
    "shipping_priority_top10",
    bench=True,
    tags=("J5", "A9", "O1", "O2"),
    oracle=f"""
    SELECT o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority AS priority,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue per order for one segment, top-10.
    lineitem⋈orders is fact-to-fact (shuffle join); customer's segment
    filter prunes ~80% of the probe side BEFORE the join (predicate pushed
    to the scan); top-10 is TakeOrderedAndProject, never a global sort.
    Exact-decimal revenue keeps ordering ties deterministic (tie-broken by
    orderkey)."""
    cutoff = "1998-01-01"
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff))
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


@register(
    "late_shipments_by_priority",
    tags=("J5", "A3", "A8"),
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           ROUND(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS late_ratio
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def late_shipments_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation over the full fact-to-fact
    join — ship-lag classification per priority class. The 90-day lateness
    predicate computes post-join (it needs columns from both sides); the
    join itself is a plain shuffle join on the order key, map-side partial
    counts after."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(late).alias("late_lines"),
            F.round(F.sum(late) * 1.0 / F.count(F.lit(1)), 4).alias("late_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Join-type completion: anti, semi, full-outer (the reference's warehouse
# relies on inner/left shapes; these close out the SQL join surface so a
# reference user porting arbitrary queries finds every join type exercised)
# --------------------------------------------------------------------------
@register(
    "customers_no_urgent_orders",
    tags=("J-anti", "A1"),
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_mktsegment
    """,
)
def customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers who never placed an urgent order, per
    segment. The filter on the right side applies BEFORE the anti join
    (anti means 'no matching row among urgent orders'); Catalyst plans a
    broadcast/shuffled anti join, never a NOT IN subquery materialization."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "brands_shipped_1995",
    tags=("J-semi", "A1"),
    oracle="""
    SELECT p.p_brand AS brand, COUNT(*) AS n_parts
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-01-01'
    )
    GROUP BY p.p_brand
    """,
)
def brands_shipped_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: parts with at least one 1995 shipment, counted per
    brand. Semi join deduplicates the probe side inside the join operator —
    no DISTINCT over the fact table, no row multiplication."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    ).select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "segment_conformance_fullouter",
    tags=("J-full", "DQ"),
    oracle="""
    WITH expected(segment) AS (
        VALUES ('AUTOMOBILE'), ('BUILDING'), ('FURNITURE'),
               ('HOUSEHOLD'), ('MACHINERY'), ('ONLINE')
    ), actual AS (
        SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment
    )
    SELECT COALESCE(e.segment, a.segment) AS segment,
           COALESCE(a.n_customers, 0) AS n_customers,
           CASE WHEN a.segment IS NULL THEN 'missing'
                WHEN e.segment IS NULL THEN 'unexpected'
                ELSE 'ok' END AS status
    FROM expected e FULL OUTER JOIN actual a ON e.segment = a.segment
    """,
)
def segment_conformance_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join as a dimension-conformance check: the expected
    segment list (including 'ONLINE', which the data does not have —
    keeping the null path non-vacuous) reconciled against the actual
    distinct segments; null sides classify as missing/unexpected. The
    expected side is a literal local relation — broadcast by construction."""
    expected = spark.createDataFrame(
        [(s,) for s in ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY", "ONLINE")],
        "e_segment string",
    )
    actual = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("a_segment"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = expected.join(
        actual, expected.e_segment == actual.a_segment, "full_outer"
    )
    return joined.select(
        F.coalesce("e_segment", "a_segment").alias("segment"),
        F.coalesce("n", F.lit(0)).alias("n_customers"),
        F.when(F.col("a_segment").isNull(), "missing")
        .when(F.col("e_segment").isNull(), "unexpected")
        .otherwise("ok")
        .alias("status"),
    )


@register(
    "orders_status_pivot",
    tags=("pivot", "A3", "extension"),
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (the BI matrix shape Power BI builds over the warehouse):
    order counts by priority pivoted across status columns. The pivot
    values are DECLARED, not discovered — at 100 TB an undeclared pivot
    runs an extra distinct-scan job just to learn the columns; declaring
    them keeps it a single groupBy with conditional partials. Oracle is
    the equivalent conditional aggregation."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
    )


@register(
    "event_type_set_ops",
    tags=("O3", "setops", "extension"),
    oracle="""
    WITH h1 AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase'
    ), h2 AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'error'
    )
    SELECT 'both' AS which, user_id FROM (SELECT user_id FROM h1 INTERSECT SELECT user_id FROM h2)
    UNION ALL
    SELECT 'purchase_only', user_id FROM (SELECT user_id FROM h1 EXCEPT SELECT user_id FROM h2)
    """,
)
def event_type_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT completion of the set-operator family (union is
    covered by union_by_name_mixed): purchasing users who also hit errors
    vs purchasing users who never did. Both Spark ops plan as aggregate +
    join (no sort), shuffling only distinct user ids."""
    ev = _t(spark, sf_dir, "events")
    h1 = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    h2 = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return h1.intersect(h2).select(F.lit("both").alias("which"), "user_id").unionAll(
        h1.exceptAll(h2).select(F.lit("purchase_only").alias("which"), "user_id")
    )


@register(
    "orders_rank_suite",
    tags=("WF", "extension"),
    oracle="""
    WITH r AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               DENSE_RANK() OVER w AS price_dense_rank,
               NTILE(4) OVER w AS price_quartile,
               ROUND(PERCENT_RANK() OVER w + 1e-9, 6) AS price_pct_rank,
               ROUND(CUME_DIST() OVER w + 1e-9, 6) AS price_cume_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    )
    SELECT * FROM r WHERE price_dense_rank <= 5
    """,
)
def orders_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window completion (row_number/rank appear elsewhere):
    dense_rank, ntile, percent_rank, cume_dist over one shared window
    (per-priority by price, orderkey tiebreak for determinism), top-5
    dense ranks kept. One shuffle on the partition key; all four
    functions evaluate in a single Window exec pass."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    r = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("price_cume_dist"),
    )
    return r.filter(F.col("price_dense_rank") <= 5)


@register(
    "user_event_gaps",
    tags=("WF", "extension", "events"),
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM g GROUP BY user_id
    """,
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per user via lag — the
    session-liveness / bot-cadence primitive. Exact integer microseconds
    end to end (sum instead of avg so no float division crosses
    engines); event_id tiebreak makes lag deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("total_gap_us"),
    )


@register(
    "customer_rfm_quartiles",
    tags=("rfm", "window", "A9", "segmentation"),
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           last_order,
           frequency,
           monetary,
           CAST(NTILE(4) OVER (ORDER BY last_order, o_custkey) AS BIGINT)
               AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency, o_custkey) AS BIGINT)
               AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary, o_custkey) AS BIGINT)
               AS m_quartile
    FROM rfm
    """,
)
def customer_rfm_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles) — the
    classic BI customer-scoring query a PowerBI user builds on the star
    schema. One groupBy on o_custkey, then three global NTILE(4) windows.

    Determinism: ntile ties are broken by appending o_custkey to every
    ORDER BY (both engines), and monetary is an exact decimal sum cast to
    double, so quartile boundaries are bitwise-reproducible.

    Scale note: unpartitioned NTILE serializes into one task — fine for
    per-customer aggregates (rows = |customers|, thousands of times
    smaller than orders), but at 100 TB the documented alternative is
    quantile cutpoints via `percentile_approx` + a broadcast range join,
    which `docs_percentiles_approx_invariant` already exercises."""
    o = _t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        decimal_sum("o_totalprice", 2, 18).alias("monetary"),
    )
    return rfm.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("last_order", "o_custkey"))
        .cast("bigint")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy("frequency", "o_custkey"))
        .cast("bigint")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "o_custkey"))
        .cast("bigint")
        .alias("m_quartile"),
    )


@register(
    "orders_above_customer_avg",
    tags=("subquery", "window", "decorrelation"),
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           CAST(a.s AS DOUBLE) / a.n AS cust_avg_price,
           o.o_totalprice - CAST(a.s AS DOUBLE) / a.n AS above_by
    FROM orders o
    JOIN (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
               COUNT(*) AS n
        FROM orders GROUP BY o_custkey
    ) a USING (o_custkey)
    WHERE o.o_totalprice > CAST(a.s AS DOUBLE) / a.n
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery decorrelation ("orders above their customer's
    average order value" — the shape BI tools generate constantly). The
    oracle spells out the aggregate-then-join rewrite; the Spark plan goes
    one better: a windowed exact-decimal average over o_custkey means ONE
    shuffle and no join at all — the self-join the naive rewrite pays is
    gone, and at 100 TB that is the difference between one exchange of the
    fact table and two plus a join.

    Determinism: cust_avg is (exact decimal sum cast double) / count on
    both engines — bitwise identical, so the > filter keeps identical
    rows and the double subtraction matches bitwise."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_ = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg_price", avg_)
        .filter(F.col("o_totalprice") > F.col("cust_avg_price"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "cust_avg_price",
            (F.col("o_totalprice") - F.col("cust_avg_price")).alias("above_by"),
        )
    )


@register(
    "promo_revenue_monthly",
    tags=("A3", "J5", "tpch"),
    oracle=f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           ROUND(CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                       THEN {_REVENUE_SQL}
                                       ELSE CAST(0 AS DECIMAL(14,2)) END)
                      / SUM({_REVENUE_SQL}) AS DOUBLE) + 1e-9, 4)
               AS promo_pct,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY strftime(l_shipdate, '%Y-%m')
    """,
)
def promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share over a fact⋈dim join —
    what fraction of each ship-month's revenue came from promo parts.
    The part side broadcasts (dim ≪ fact); both the conditional and the
    total go through exact decimal sums so the ratio is
    bitwise-deterministic before the single double division; the 1e-9
    nudge + ROUND(4) is the suite's float-comparison convention."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue_dec()
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(14,2)")
    )
    return (
        joined.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).alias("_p"),
            F.sum(rev).alias("_t"),
        )
        .select(
            "ship_month",
            F.round(
                (F.lit(100.0) * F.col("_p") / F.col("_t")).cast("double") + 1e-9, 4
            ).alias("promo_pct"),
            F.col("_t").cast("decimal(38,2)").cast("double").alias("total_revenue"),
        )
    )


@register(
    "top_revenue_share_nations",
    tags=("A8", "J5", "tpch", "scalar-subquery"),
    oracle=f"""
    WITH rev AS (
        SELECT n.n_name AS nation,
               SUM({_REVENUE_SQL}) AS nation_rev
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), tot AS (SELECT SUM(nation_rev) AS total FROM rev)
    SELECT nation,
           CAST(ROUND(nation_rev, 2) AS DOUBLE) AS nation_revenue,
           ROUND(CAST(100.0 * nation_rev / total AS DOUBLE) + 1e-9, 4)
               AS revenue_share_pct
    FROM rev, tot
    WHERE nation_rev > 0.04 * total
    """,
)
def top_revenue_share_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: a grouped aggregate FILTERED against a scalar of
    the global aggregate (HAVING sum > x% of total). The global total is
    an UNPARTITIONED window over the per-nation aggregate output — ~25
    rows, so the SinglePartition exchange is trivially bounded and the
    4-table join+agg subtree evaluates ONCE (a crossJoined scalar
    aggregate would re-evaluate the whole subtree for the 1-row side:
    two fact scans — plan-guarded against). All sums exact decimal, one
    double division at the end; the threshold predicate stays
    decimal×decimal so the cut is bitwise-identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue_dec()).alias("nation_rev"))
    )
    w = Window.partitionBy()  # over the ~|nations| aggregate rows only
    return (
        rev.withColumn("total", F.sum("nation_rev").over(w))
        .filter(
            F.col("nation_rev")
            > F.lit(0.04).cast("decimal(3,2)") * F.col("total")
        )
        .select(
            "nation",
            F.col("nation_rev").cast("decimal(38,2)").cast("double").alias("nation_revenue"),
            F.round(
                (F.lit(100.0) * F.col("nation_rev") / F.col("total")).cast(
                    "double"
                )
                + 1e-9,
                4,
            ).alias("revenue_share_pct"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: nation-pair trade volume (two dimension roles on one
# fact row: supplier nation AND customer nation)
# --------------------------------------------------------------------------
@register(
    "nation_pair_trade_volume",
    tags=("J5", "A1", "tpch"),
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           strftime(l.l_shipdate, '%Y') AS ship_year,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name != nc.n_name
    GROUP BY ns.n_name, nc.n_name, strftime(l.l_shipdate, '%Y')
    """,
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue per (supplier nation, customer
    nation, ship year). The same nation dim joins TWICE in different roles
    (broadcast both — alias the frames, Catalyst dedups the scan); supplier
    and customer resolve through the fact chain. At 100 TB supplier/
    customer are fact-sized (shuffle joins under AQE); only nation
    broadcasts. The inequality filter runs AFTER the role joins, on the
    two small dim columns."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("ship_year"),
        )
        .agg(
            F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: order-count histogram with a join-clause predicate
# --------------------------------------------------------------------------
@register(
    "customer_order_count_distribution",
    tags=("J-left", "A1", "tpch"),
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def customer_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many (non-urgent)
    orders — the predicate lives in the JOIN clause, not WHERE, so
    customers whose every order is urgent still appear with count 0
    (filter-then-left-join is the Spark equivalent). Two aggregations:
    per-customer count (shuffle on custkey), then the tiny histogram."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q16 shape: distinct-supplier counts under a NOT-IN exclusion
# --------------------------------------------------------------------------
@register(
    "brand_supplier_counts",
    tags=("A11", "J5", "tpch"),
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_size
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp stood in by the lineitem link): how many
    distinct suppliers ship each surviving (brand, size). The NOT IN /
    IN-list predicates are dim-side — they prune part BEFORE the broadcast
    join, so the fact scan only hashes against surviving parts; the
    count-distinct is one partial-aggregated shuffle on the group keys."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            ~F.col("p_brand").isin("Brand#1", "Brand#2")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-attribute predicate (OR of ANDs)
# --------------------------------------------------------------------------
@register(
    "disjunctive_parts_revenue",
    tags=("A1", "J5", "tpch"),
    oracle=f"""
    SELECT CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs mixing dim attributes (brand, size)
    with fact attributes (quantity). The dim-only residue of the
    disjunction (brand IN set, size <= 15) is FACTORED OUT and pushed to
    the part scan before the broadcast join — the classic Q19 rewrite the
    optimizer cannot always derive — while the exact mixed predicate
    filters post-join. One row out: the aggregate-only result shape."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: global scalar threshold + anti join
# --------------------------------------------------------------------------
@register(
    "top_balance_inactive_customers",
    tags=("A4", "J-anti", "tpch"),
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                   / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def top_balance_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance who
    never placed an order. The threshold is a 1-row broadcast scalar
    (exact decimal sum / exact count, so the double compares identically
    on any engine — no float-summation-order hazard at the boundary); the
    'never ordered' clause is a LEFT ANTI join, Spark's native NOT EXISTS.
    Second scan of the (dim-sized) customer table for the scalar is
    deliberate and cheap relative to shipping a window over it."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# ==========================================================================
# Correlated-subquery shapes (round 7): the SQL class a DirectQuery BI layer
# emits against the reference's star schema (reference README.md:437,462-466
# — Power BI writes correlated scalar subqueries, EXISTS/NOT EXISTS, and
# IN-over-HAVING against the gold tables). Each oracle below is the
# *correlated* BI formulation; each Spark plan is the decorrelated rewrite a
# 100 TB cluster needs: window aggregates on the already-required shuffle
# key instead of per-row re-scans, LEFT SEMI/ANTI hash joins instead of
# nested-loop EXISTS. The fixture has no partsupp table, so the Q2/Q20
# shapes are re-keyed onto lineitem (same correlation structure: min-per-
# group lookup resp. correlated HAVING threshold).
#
# Determinism contract: every correlated threshold is exact arithmetic —
# decimal sums/counts compared via integer-scaled inequalities (5*qty*cnt <
# sum, 8*qty_sp > qty_total) so both engines keep bitwise-identical rows;
# double columns in outputs are stored values or exact-decimal casts.
# ==========================================================================


@register(
    "min_price_supplier_per_part",
    tags=("J5", "tpch", "correlated-scalar", "Q2-shape"),
    oracle="""
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey,
           l.l_extendedprice AS min_price
    FROM part p, supplier s, lineitem l, nation n, region r
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND p.p_size = 15
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
      AND l.l_extendedprice = (
          SELECT MIN(l2.l_extendedprice)
          FROM lineitem l2, supplier s2, nation n2, region r2
          WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    """,
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN lookup — for each size-15 part,
    the EUROPE-region sale(s) at that part's minimum extended price.

    Decorrelation: the oracle's per-part correlated MIN re-scans lineitem
    per row; here the region/size filters are applied ONCE (supplier and
    part dims broadcast), then ``MIN() OVER (PARTITION BY p_partkey)`` rides
    the single shuffle the grouping needs — no self-join, no second fact
    scan. The equality filter compares stored doubles against a MIN of the
    same stored values, so both engines keep identical rows (no arithmetic
    at the boundary).

    100 TB: one fact shuffle on l_partkey; dims broadcast; result bounded
    by (filtered parts × ties)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey")
    )
    eu_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey)
        .withColumn("_min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_min_price"))
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            "p_partkey",
            F.col("l_extendedprice").alias("min_price"),
        )
    )


@register(
    "late_order_priority_count",
    tags=("J-semi", "tpch", "exists", "Q4-shape"),
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-04-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def late_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS against the fact — orders in a quarter with at
    least one lineitem shipped >60 days after the order date (the fixture
    has no l_commitdate/l_receiptdate, so lateness is ship-vs-order lag).

    Decorrelation: EXISTS becomes a LEFT SEMI hash join on l_orderkey with
    the cross-table date predicate evaluated as the join's residual
    condition — one pass over each fact, no per-order re-scan, and the
    semi join short-circuits on first match (never duplicates orders).

    100 TB: the quarter filter prunes orders before the shuffle; both
    sides exchange on orderkey once; priority agg is map-side partial."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "small_quantity_order_revenue",
    tags=("A4", "tpch", "correlated-scalar", "Q17-shape"),
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND 5 * CAST(l.l_quantity AS DECIMAL(14,2))
            * (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
          < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(14,2)))
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: avg-per-key guard — revenue from brand lineitems
    whose quantity is below 20% of that part's average quantity.

    The textbook predicate ``qty < 0.2 * AVG(qty)`` hides a float hazard
    (0.2*avg differs in the last ulp across engines); both sides here use
    the integer-scaled exact form ``5·qty·cnt < Σqty`` over decimals, so
    the kept-row set is bitwise identical.

    Decorrelation: the correlated per-part AVG re-scan becomes SUM/COUNT
    windows over l_partkey AFTER the brand semi-filter — valid because
    every lineitem of a given partkey shares that part's brand, so the
    brand filter never removes rows from a surviving part's window. ONE
    lineitem scan, one shuffle (partkey), dims broadcast; the oracle pays
    three scans.

    100 TB: window rides the partkey shuffle; final agg is a 1-row
    reduce."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    qty_dec = F.col("l_quantity").cast("decimal(14,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("_sum_qty", F.sum(qty_dec).over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(w))
        .filter(F.lit(5) * qty_dec * F.col("_cnt") < F.col("_sum_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast(
                    "double"
                )
                / 7.0
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "large_order_customers",
    bench=True,
    tags=("A1", "J5", "tpch", "in-having", "Q18-shape"),
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE)
               AS total_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped HAVING — customers whose orders
    total more than 250 units.

    Decorrelation one better: the oracle aggregates lineitem for the IN
    list and then RE-JOINS lineitem to recompute the same sum; here the
    per-order decimal sum is computed ONCE, filtered, and carried as
    total_qty — one lineitem scan instead of two, and the final group-by
    disappears (orderkey is already unique after the aggregate).

    100 TB: lineitem aggregates map-side then shuffles on orderkey; the
    surviving big-order set is tiny (tail of the qty distribution), so AQE
    broadcasts it into the orders join; customer attaches by shuffle or
    broadcast at AQE's discretion (fixture: broadcast)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("_qty"))
        .filter(F.col("_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "dominant_share_suppliers",
    tags=("J-semi", "tpch", "correlated-having", "Q20-shape"),
    oracle="""
    SELECT s.s_name, s.s_acctbal, n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING 8 * SUM(CAST(l.l_quantity AS DECIMAL(14,2))) >
               (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(14,2)))
                FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
    """,
)
def dominant_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN + correlated HAVING — suppliers shipping
    more than 1/8 of the total volume of some 'red' part (the fixture has
    no partsupp/availqty, so the correlated threshold is re-keyed to the
    part's total shipped volume; the correlation structure — per-group sum
    vs a per-partkey correlated scalar — is Q20's).

    Decorrelation: the correlated per-part total is a SUM window over the
    ALREADY-AGGREGATED (suppkey, partkey) frame — exact because a sum of
    per-supplier decimal sums equals the part total; no second lineitem
    scan (the oracle pays one per probed part). The share test is the
    integer-scaled exact form ``8·qty_sp > qty_total``. Qualifying
    suppkeys are distinct'd (bounded by the supplier dim) and applied as a
    broadcast LEFT SEMI join.

    100 TB: one fact scan, one shuffle on (suppkey, partkey), window on
    the aggregated frame, dims broadcast."""
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    per_sp = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("_qty_sp"))
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        per_sp.withColumn("_qty_total", F.sum("_qty_sp").over(w))
        .filter(F.lit(8) * F.col("_qty_sp") > F.col("_qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(F.broadcast(qual), supp.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


@register(
    "sole_late_supplier_ranking",
    bench=True,
    tags=("J-semi", "J-anti", "tpch", "exists", "not-exists", "Q21-shape"),
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s, lineitem l1, orders o, nation n
    WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND s.s_nationkey = n.n_nationkey
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
)
def sole_late_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS against the
    same fact — late lineitems of finished multi-supplier orders where this
    supplier was the ONLY late one (lateness = shipped >60 days after
    order date, the fixture's commitdate stand-in).

    Decorrelation: both correlated subqueries collapse into per-
    (orderkey, suppkey) aggregates + two windows over orderkey on the
    aggregated frame — n_supp>1 IS the EXISTS (another supplier in the
    order), n_late_supp==1 IS the NOT EXISTS (no OTHER late supplier,
    given this one is late). numwait then sums this supplier's late rows.
    ONE scan of lineitem and orders each; the oracle's formulation
    re-probes lineitem twice per row.

    100 TB: lineitem⋈orders shuffles on orderkey once; the (orderkey,
    suppkey) aggregate and both windows ride that same key prefix;
    supplier dim broadcasts; final agg is supplier-dim-sized."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("_n_late_rows"))
    )
    w = Window.partitionBy("l_orderkey")
    qual = (
        per_os.withColumn("_n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "_n_late_supp",
            F.sum((F.col("_n_late_rows") > 0).cast("int")).over(w),
        )
        .filter(
            (F.col("_n_late_rows") > 0)
            & (F.col("_n_supp") > 1)
            & (F.col("_n_late_supp") == 1)
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(F.broadcast(supp), qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("_n_late_rows").cast("long").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q5 / Q8 / Q10 shapes — the remaining classic BI join geometries (r7)
# --------------------------------------------------------------------------
@register(
    "local_supplier_revenue",
    tags=("J5", "tpch"),
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue earned when the supplier and the customer
    sit in the SAME nation — two fact-sized joins (orders, supplier via
    lineitem keys) plus the colocation equality pushed as a post-join
    filter, nation broadcast. The year predicate prunes the orders scan
    (PushedFilters); at 100 TB AQE handles the two shuffle joins and the
    nation dim always broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "nation_market_share",
    tags=("A8", "J5", "tpch"),
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           ROUND(CAST(100.0 * SUM(CASE WHEN n.n_name = 'NATION_3'
                                       THEN {_REVENUE_SQL}
                                       ELSE CAST(0 AS DECIMAL(14,2)) END)
                      / SUM({_REVENUE_SQL}) AS DOUBLE) + 1e-9, 4)
               AS share_pct,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's yearly share of global supplied
    revenue — the conditional-vs-total ratio over a fact⋈fact⋈dim join.
    Both sums are exact decimals; one double division + the suite's
    ROUND(+1e-9, 4) convention at the end. The year never leaves the
    order row until the final groupBy, so no pre-aggregation is lost to
    the join order Catalyst picks."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    rev = _revenue_dec()
    target = F.when(F.col("n_name") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(14,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(target).alias("_n"), F.sum(rev).alias("_t"))
        .select(
            "order_year",
            F.round(
                (F.lit(100.0) * F.col("_n") / F.col("_t")).cast("double") + 1e-9, 4
            ).alias("share_pct"),
            F.col("_t").cast("decimal(38,2)").cast("double").alias("total_revenue"),
        )
    )


@register(
    "returned_item_top_customers",
    tags=("A9", "J5", "O2", "tpch"),
    oracle=f"""
    SELECT c.c_custkey AS custkey, ANY_VALUE(c.c_name) AS name,
           ANY_VALUE(n.n_name) AS nation,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS lost_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey
    ORDER BY lost_revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most value in a quarter window
    — returned-flag filter pushed to the lineitem scan, date window
    pushed to orders, TakeOrderedAndProject top-20 with the id
    tie-break that makes LIMIT deterministic cross-engine."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.any_value("c_name").alias("name"),
            F.any_value("n_name").alias("nation"),
            F.sum(_revenue_dec()).cast("decimal(38,2)").cast("double").alias("lost_revenue"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q6 / Q9 / Q15 shapes — the last three of the 22 classic geometries (r8).
# With these the canon the reference's BI layer draws on (README.md:437,
# 462-466: star schema + DirectQuery SQL) is covered 22/22.
# --------------------------------------------------------------------------
@register(
    "forecast_revenue_change",
    bench=False,
    tags=("A1", "tpch", "Q6-shape"),
    oracle="""
    SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) *
                              CAST(l_discount AS DECIMAL(3,2))), 0)
                AS DOUBLE) AS promo_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue a discount-band change would free up — a
    pure scan-side query. Every predicate (date window, discount band,
    quantity cap) is scan-pushable; the aggregate is a single global
    partial+final sum with no grouping shuffle beyond the 1-row exchange.
    Discount and price are clean 2dp fixtures, so the product is exact in
    DECIMAL — the sum is bitwise-deterministic under any partitioning.
    Ref: the reference's discount-sensitivity dashboards aggregate the
    same band filter warehouse-side (ClickHouse SQL)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_discount").cast("decimal(3,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(F.col("l_extendedprice").cast("decimal(14,2)") * disc),
                F.lit(0).cast("decimal(17,4)"),
            )
            .cast("double")
            .alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "product_type_profit",
    bench=True,
    tags=("J5", "A1", "tpch", "Q9-shape"),
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM({_REVENUE_SQL} -
                    CAST(p.p_retailprice AS DECIMAL(14,2)) *
                    CAST(0.10 AS DECIMAL(3,2)) *
                    CAST(l.l_quantity AS DECIMAL(14,2))),
                2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type LIKE '%DARD%'
    GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT)
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for one
    product line. The fixture has no partsupp, so supply cost is stood in
    by 10% of the part's retail price — the join geometry (fact ⋈ two
    broadcast dims ⋈ fact ⋈ broadcast nation, LIKE filter contracting the
    part dim BEFORE it reaches the fact) is exactly Q9's. The part filter
    halves the fact early via the broadcast hash join; orders joins on the
    already-filtered residue. All money terms in DECIMAL: the profit sum
    is order-independent."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").like("%DARD%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    cost = (
        F.col("p_retailprice").cast("decimal(14,2)")
        * F.lit(0.10).cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(14,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_revenue_dec() - cost).cast("decimal(38,2)").cast("double").alias("profit"))
    )


@register(
    "top_supplier_by_revenue",
    bench=False,
    tags=("A8", "A9", "tpch", "scalar-max", "Q15-shape"),
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS suppkey,
               SUM({_REVENUE_SQL}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM revenue r
    JOIN supplier s ON r.suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarter revenue —
    WITH-ties semantics, not LIMIT 1 (a revenue tie must return both
    rows; DECIMAL revenue makes the tie comparison exact, so ties are
    well-defined cross-engine). Decorrelated as a rank-1 window over the
    grouped revenue table: ONE lineitem scan, one grouping shuffle, and a
    single-partition window over the |suppliers|-sized aggregate — never
    a second scan for the scalar MAX, never a self-join. The supplier dim
    joins broadcast, after the rank filter has shrunk the left side."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_revenue_dec()).alias("total_rev")
    )
    # |suppliers|-sized input: the empty-frame global window is bounded
    best = revenue.withColumn(
        "_rk", F.rank().over(Window.orderBy(F.col("total_rev").desc()))
    ).filter(F.col("_rk") == 1)
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(supp), best.suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("total_rev").cast("decimal(38,2)").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# ClickHouse maxIntersections / maxIntersectionsPosition (r11)
# --------------------------------------------------------------------------
@register(
    "supplier_max_intransit_overlap",
    tags=("clickhouse-surface", "intervals", "A-ext"),
    bench=True,
    oracle="""
    WITH ev AS (
        SELECT l_suppkey AS suppkey,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   + CAST(l_quantity AS BIGINT) + 1 AS d,
               0 AS k, -1 AS delta
        FROM lineitem
        UNION ALL
        SELECT l_suppkey,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT),
               1 AS k, 1 AS delta
        FROM lineitem
    ),
    scored AS (
        SELECT suppkey, d,
               SUM(delta) OVER (
                   PARTITION BY suppkey ORDER BY d, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS rs
        FROM ev
    ),
    m AS (SELECT suppkey, MAX(rs) AS mx FROM scored GROUP BY suppkey)
    SELECT s.suppkey,
           CAST(m.mx AS INT) AS max_overlap,
           CAST(MIN(s.d) AS BIGINT) AS first_peak_day
    FROM scored s JOIN m ON s.suppkey = m.suppkey AND s.rs = m.mx
    GROUP BY s.suppkey, m.mx
    """,
)
def supplier_max_intransit_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` + ``maxIntersectionsPosition`` per
    supplier: the peak number of simultaneously in-transit line items and
    the first day that peak is reached. The fixture's lineitem carries no
    receipt date, so transit time is the documented deterministic
    stand-in ``ceil(l_quantity)`` days — interval [ship_day,
    ship_day + qty] inclusive, all integer wall-date day indexes
    (NTZ-safe and session-timezone-proof on both engines).

    Spark-first: the classic sweep — each interval explodes to a +1
    entry and a -1 exit at ``end + 1``, one per-supplier running sum
    over the (day, kind) order with exits processed BEFORE entries at
    equal coordinates (intervals touching end-to-start never double
    count), then ``max(struct(rs, -day))`` reads off the peak AND its
    first position in a single aggregation. Within an equal (day, kind)
    run all deltas share a sign, so prefix values are order-invariant —
    no per-row tiebreak is needed for cross-engine equality. One explode
    (2n rows), one shuffle, one sort; at 100 TB the sweep stays fully
    partition-parallel because intervals never cross suppliers."""
    from ..operators.intervals import max_intersections

    li = _t(spark, sf_dir, "lineitem")
    # wall-date day index: NTZ-safe and session-TZ-proof on both engines
    ds = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    de = ds + F.col("l_quantity").cast("long")
    return max_intersections(li, "l_suppkey", ds, de).select(
        F.col("key").alias("suppkey"),
        "max_overlap",
        F.col("first_peak_pos").alias("first_peak_day"),
    )


@register(
    "supplier_intransit_covered_days",
    tags=("clickhouse-surface", "intervals", "A-ext"),
    oracle="""
    WITH ev AS (
        SELECT l_suppkey AS key,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               1 AS delta
        FROM lineitem
        UNION ALL
        SELECT l_suppkey,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   + CAST(l_quantity AS BIGINT) + 1,
               -1
        FROM lineitem
    ),
    per_coord AS (SELECT key, d, SUM(delta) AS delta FROM ev GROUP BY key, d),
    scored AS (
        SELECT key, d, delta,
               SUM(delta) OVER (PARTITION BY key ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS active,
               LEAD(d) OVER (PARTITION BY key ORDER BY d) AS next_d
        FROM per_coord
    )
    SELECT key AS suppkey,
           CAST(SUM(CASE WHEN active > 0 AND next_d IS NOT NULL
                         THEN next_d - d ELSE 0 END) AS BIGINT) AS covered_days
    FROM scored GROUP BY key
    """,
)
def supplier_intransit_covered_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum`` per supplier: how many distinct
    days had at least one line item in transit — the union length of the
    same closed [ship_day, ship_day + qty] intervals
    ``supplier_max_intransit_overlap`` sweeps (passed half-open as
    [start, end+1)), overlap merged, idle gaps excluded. Utilization's
    denominator, peak-load's complement. Deltas collapse per (key, day)
    BEFORE the running sum, so no tie order exists to pin — the sweep is
    a pure function of the coordinates on any engine."""
    from ..operators.intervals import interval_length_sum

    li = _t(spark, sf_dir, "lineitem")
    ds = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    de = ds + F.col("l_quantity").cast("long") + 1
    return interval_length_sum(li, "l_suppkey", ds, de).select(
        F.col("key").alias("suppkey"), F.col("covered").alias("covered_days")
    )
