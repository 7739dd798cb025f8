"""Warehouse-layer transform plans — the ClickHouse MV/backfill surface.

Re-expresses the reference's star-schema build logic (ClickHouse Data
Warehouse Creation + Backfill DDLs.txt: 5 dims, 7 facts, 13 MVs) on the
fixture tables. Each SURVEY.md §2.3 operator W1-W13 appears in at least one
plan below; surrogate keys standardize on xxhash64 in place of cityHash64
(see functions/expressions.py docstring).

Oracle note: hash *values* are engine-specific, so oracled outputs never
contain raw hashes — they assert hash-derived invariants (distinct counts,
join cardinalities) that hold iff the keys are deterministic and
collision-free, which is the property the warehouse actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.expressions import decimal_avg, decimal_sum, multi_if, surrogate_key
from ..sources.tables import load_table


# --------------------------------------------------------------------------
# Dim build: rename/project (W4), multiIf (W8), bool normalization (W9),
# conditional NULL-ing (W3), null-safe arithmetic (W7)
# --------------------------------------------------------------------------
@register(
    "dim_customer_build",
    tags=("W3", "W4", "W7", "W8", "W9"),
    oracle="""
    SELECT c_custkey AS customer_id,
           TRIM(LOWER(c_name)) AS customer_name,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'auto'
                WHEN c_mktsegment = 'MACHINERY' THEN 'machine'
                WHEN c_mktsegment = 'BUILDING' THEN 'build'
                ELSE 'other' END AS segment_code,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS is_positive_bal,
           CASE WHEN COALESCE(c_nationkey, 0) = 0 THEN NULL
                ELSE c_nationkey END AS nation_fk,
           c_acctbal + 100.0 AS adjusted_bal
    FROM customer
    """,
)
def dim_customer_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 dimension build: projection+rename (DDL 248-250 `strBadge AS
    badge_url`), multiIf media_type (DDL 433-437), yes/no boolean
    normalization (DDL 409), zero-key NULL-ing (DDL 334), null-propagating
    arithmetic (DDL 364). Pure narrow transforms — no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.trim(F.lower("c_name")).alias("customer_name"),
        multi_if(
            (F.col("c_mktsegment") == "AUTOMOBILE", "auto"),
            (F.col("c_mktsegment") == "MACHINERY", "machine"),
            (F.col("c_mktsegment") == "BUILDING", "build"),
            default="other",
        ).alias("segment_code"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("is_positive_bal"),
        F.when(F.coalesce("c_nationkey", F.lit(0)) == 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("nation_fk"),
        (F.col("c_acctbal") + 100.0).alias("adjusted_bal"),
    )


# --------------------------------------------------------------------------
# W2 surrogate keys: deterministic + collision-free, asserted via counts
# --------------------------------------------------------------------------
@register(
    "surrogate_key_integrity",
    tags=("W2", "W3", "J5"),
    oracle="""
    SELECT COUNT(*) AS n_customers,
           COUNT(DISTINCT c_custkey) AS n_distinct_keys,
           COUNT(DISTINCT c_custkey) AS n_distinct_sk,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_sk
    FROM customer
    """,
)
def surrogate_key_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 surrogate keys (our cityHash64 stand-in, DDL 18/42/62/78/94):
    distinct(sk) must equal distinct(natural key) — determinism +
    collision-freedom, the invariant the star schema depends on."""
    c = load_table(spark, sf_dir, "customer").withColumn("sk", surrogate_key("c_custkey"))
    return c.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count_distinct("c_custkey").alias("n_distinct_keys"),
        F.count_distinct("sk").alias("n_distinct_sk"),
        F.sum(F.when(F.col("sk").isNull(), 1).otherwise(0)).alias("n_null_sk"),
    )


@register(
    "fact_join_on_surrogate_keys",
    tags=("W2", "J5"),
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def fact_join_on_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join executed entirely on xxhash64 surrogate keys (fact and dim
    both derive sk from the natural key at build time, DDL 331-334). Results
    must be identical to the natural-key join — that is the oracle."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "cust_sk", surrogate_key("o_custkey")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .withColumn("cust_sk", surrogate_key("c_custkey"))
        .withColumn("nation_sk", surrogate_key("c_nationkey"))
        .select("cust_sk", "nation_sk")
    )
    nation = load_table(spark, sf_dir, "nation").withColumn(
        "nation_sk", surrogate_key("n_nationkey")
    )
    return (
        orders.join(cust, "cust_sk")
        .join(F.broadcast(nation), "nation_sk")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            decimal_sum("o_totalprice", 2, 16).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# W1 normalized filter + W10/W11/W13 date bucketing & alias columns
# --------------------------------------------------------------------------
@register(
    "fact_orders_monthly_build",
    tags=("W1", "W6", "W11", "W13", "A2"),
    oracle="""
    SELECT STRFTIME(o_orderdate, '%Y%m') AS order_month,
           CAST(o_orderdate AS DATE) AS order_date,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total
    FROM orders
    WHERE LOWER(TRIM(o_orderstatus)) = 'f'
    GROUP BY 1, 2
    """,
)
def fact_orders_monthly_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-string filter `lower(trim(x)) = const` (the soccer-only
    W1 filter, DDL 253 et al.) + toYYYYMM month bucketing for partition
    layout (W11, DDL 144) + toDate alias column (W13, DDL 141). At scale
    `order_month` is the physical partition column."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.lower(F.trim("o_orderstatus")) == "f")
        .groupBy(
            F.date_format("o_orderdate", "yyyyMM").alias("order_month"),
            F.to_date("o_orderdate").alias("order_date"),
        )
        .agg(F.count(F.lit(1)).alias("n"), decimal_sum("o_totalprice", 2, 16).alias("total"))
    )


# --------------------------------------------------------------------------
# W5 array literal flattening + array ops
# --------------------------------------------------------------------------
@register(
    "array_flatten_league_ids",
    tags=("W5",),
    oracle="""
    SELECT n_nationkey AS nation_id,
           LEN([n_nationkey, n_nationkey + 100, n_regionkey]) AS n_ids,
           CAST((n_nationkey + n_nationkey + 100 + n_regionkey) AS BIGINT) AS id_sum,
           list_contains([CAST(n_nationkey AS BIGINT),
                          CAST(n_nationkey + 100 AS BIGINT),
                          CAST(n_regionkey AS BIGINT)], 0) AS has_zero
    FROM nation
    """,
)
def array_flatten_league_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-literal flattening `[idLeague, idLeague2, ...] AS league_ids`
    (DDL 264) + array size / aggregate / membership — outputs scalars so the
    oracle is engine-neutral."""
    n = load_table(spark, sf_dir, "nation")
    ids = F.array(
        F.col("n_nationkey").cast("long"),
        (F.col("n_nationkey") + 100).cast("long"),
        F.col("n_regionkey").cast("long"),
    )
    return n.select(
        F.col("n_nationkey").alias("nation_id"),
        F.size(ids).cast("long").alias("n_ids"),
        F.aggregate(ids, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("id_sum"),
        F.array_contains(ids, F.lit(0).cast("long")).alias("has_zero"),
    )


# --------------------------------------------------------------------------
# W6 timestamp fallback + W12 null-normalized sort key
# --------------------------------------------------------------------------
@register(
    "null_normalized_ordering",
    tags=("W6", "W12", "O1"),
    oracle="""
    SELECT event_type,
           CAST(COALESCE(NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT), 0),
                         -1) AS BIGINT) AS k_norm,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def null_normalized_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-normalized key `ifNull(minute, -1)` used in ClickHouse sort keys
    (W12, DDL 191) + coalesce-fallback chains (W6, DDL 341)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    k_norm = F.coalesce(F.nullif(k, F.lit(0)), F.lit(-1).cast("long"))
    return (
        ev.groupBy("event_type", k_norm.alias("k_norm"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# J1-J3: fact-enrichment inner join to inherit a parent attribute
# --------------------------------------------------------------------------
@register(
    "lineitem_inherit_order_filter",
    tags=("J1", "W1"),
    oracle="""
    SELECT l.l_returnflag AS returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS total
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE LOWER(TRIM(o.o_orderstatus)) = 'o'
    GROUP BY 1
    """,
)
def lineitem_inherit_order_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J1-J3 pattern: a child stream with no filterable attribute
    inner-joins its parent to inherit the W1 filter (reference: DDL 369-379,
    raw_event_stats INNER JOIN raw_event USING (idEvent) — stats carry no
    strSport). Filter applies to the parent *before* the join so the join
    input shrinks."""
    li = load_table(spark, sf_dir, "lineitem")
    parents = (
        load_table(spark, sf_dir, "orders")
        .filter(F.lower(F.trim("o_orderstatus")) == "o")
        .select("o_orderkey")
    )
    return (
        li.join(parents, li.l_orderkey == parents.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum("l_extendedprice", 2, 16).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# ClickHouse dictGet family (r9): dictionary lookups as broadcast joins.
# The DirectQuery BI idiom for dim enrichment without a user-visible join —
# dictGet / dictGetOrDefault / dictHas (public ClickHouse semantics; the
# reference's Power BI model resolves the same star-schema lookups,
# README.md dims->facts relationships).
# --------------------------------------------------------------------------
@register(
    "customer_geo_dictget",
    tags=("J5", "W4"),
    bench=True,
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def customer_geo_dictget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained dictGet: customer -> nation dict (name + regionkey) ->
    region dict (name). Each lookup is a broadcast hash probe — the fact
    side never shuffles (plan-guarded in tests/test_operators.py), which
    is ClickHouse's dictionary memory model at any fact scale."""
    from ..operators.dictionary import Dictionary

    cust = load_table(spark, sf_dir, "customer")
    nation_dict = Dictionary(
        load_table(spark, sf_dir, "nation"), "n_nationkey", ("n_name", "n_regionkey")
    )
    region_dict = Dictionary(
        load_table(spark, sf_dir, "region"), "r_regionkey", ("r_name",)
    )
    enriched = nation_dict.get(
        cust, {"nation": "n_name", "_rk": "n_regionkey"}, "c_nationkey"
    )
    enriched = region_dict.get(enriched, {"region": "r_name"}, "_rk")
    return (
        enriched.groupBy("nation", "region")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            decimal_avg("c_acctbal", 2, 14).alias("avg_bal"),
        )
    )


@register(
    "supplier_nation_dictget_default",
    tags=("J5", "W8"),
    oracle="""
    WITH d AS (
        SELECT n.n_nationkey, n.n_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('EUROPE', 'ASIA')
    )
    SELECT COALESCE(d.n_name, 'OTHER') AS nation,
           COUNT(*) AS n_suppliers,
           CAST(COUNT(d.n_nationkey) AS BIGINT) AS n_known
    FROM supplier s LEFT JOIN d ON s.s_nationkey = d.n_nationkey
    GROUP BY COALESCE(d.n_name, 'OTHER')
    """,
)
def supplier_nation_dictget_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dictGetOrDefault + dictHas over a PARTIAL dictionary (nations of
    EUROPE/ASIA only): missing keys take the default ('OTHER') instead of
    NULL, and dictHas exposes membership — both documented ClickHouse
    behaviors, expressed as one broadcast left join + a key-presence
    probe (a present key's NULL attribute stays NULL, never the
    default)."""
    from ..operators.dictionary import Dictionary

    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    partial = nation.join(
        F.broadcast(region.filter(F.col("r_name").isin("EUROPE", "ASIA"))),
        nation.n_regionkey == region.r_regionkey,
    )
    d = Dictionary(partial, "n_nationkey", ("n_name",))
    enriched = d.get(
        supp, {"nation": "n_name"}, "s_nationkey", defaults={"nation": "OTHER"}
    )
    enriched = d.has(enriched, "known", F.col("s_nationkey"))
    return (
        enriched.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.when(F.col("known"), 1).otherwise(0)).alias("n_known"),
        )
    )


@register(
    "customer_nation_hierarchy",
    tags=("J7",),
    oracle="""
    WITH RECURSIVE nodes AS (
        SELECT n_nationkey + 100 AS id, CAST(n_regionkey AS BIGINT) AS parent
        FROM nation
        UNION ALL
        SELECT CAST(r_regionkey AS BIGINT) AS id, CAST(NULL AS BIGINT) AS parent
        FROM region
    ),
    walk(custkey, level, ancestor) AS (
        SELECT c_custkey, 0, CAST(c_nationkey + 100 AS BIGINT) FROM customer
        UNION ALL
        SELECT w.custkey, w.level + 1, n.parent
        FROM walk w JOIN nodes n ON w.ancestor = n.id
        WHERE n.parent IS NOT NULL AND w.level < 8
    )
    SELECT custkey, level, ancestor FROM walk
    """,
)
def customer_nation_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dictGetHierarchy over a two-level geo hierarchy (nation node ->
    region root; nation ids shifted +100 into a shared node id space).
    Each hierarchy level is one broadcast probe — the customer side never
    shuffles — and the DuckDB oracle is a genuinely independent recursive
    CTE over the same parent links. Output: one (custkey, level,
    ancestor) row per chain element."""
    from ..operators.dictionary import Dictionary, dict_get_hierarchy

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nodes = nation.select(
        (F.col("n_nationkey") + 100).cast("long").alias("id"),
        F.col("n_regionkey").cast("long").alias("parent"),
    ).unionByName(
        region.select(
            F.col("r_regionkey").cast("long").alias("id"),
            F.lit(None).cast("long").alias("parent"),
        )
    )
    d = Dictionary(nodes, "id", ("parent",))
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        (F.col("c_nationkey") + 100).cast("long").alias("node"),
    )
    walked = dict_get_hierarchy(cust, d, "parent", "node", "h")
    return walked.select(
        "custkey", F.posexplode("h").alias("level", "ancestor")
    )
