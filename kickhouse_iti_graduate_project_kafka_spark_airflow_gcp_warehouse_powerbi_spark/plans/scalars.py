"""Scalar-function surface coverage (SURVEY.md §2.8) in oracled queries.

One query per function family — string, date/time, math, conditional/null,
JSON, cast — so the complete observed scalar inventory of the reference is
exercised against the DuckDB oracle, not just present in the library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.tables import load_table


@register(
    "string_function_suite",
    tags=("P1", "scalar-string"),
    oracle=r"""
    SELECT LOWER(TRIM(c_name)) AS norm_name,
           LENGTH(c_name) AS name_len,
           regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
           CONCAT(c_mktsegment, '|', CAST(c_custkey AS VARCHAR)) AS seg_key,
           regexp_replace(LOWER(c_mktsegment), '[^a-z0-9]+', '_') AS slug,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
           CASE WHEN regexp_matches(c_mktsegment, '(?i)^auto') THEN 1 ELSE 0 END
               AS is_auto,
           SUBSTRING(c_mktsegment, 1, 4) AS seg4
    FROM customer
    """,
)
def string_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: lower/trim/length/regexp_extract/concat/
    regexp_replace-slugify/LIKE/rlike/substring (reference: §2.8 row 1 —
    lowerUTF8, trim, LIKE, rlike('(?i)soccer'), LENGTH, concat_ws,
    regexp_extract, slugify re.sub)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.lower(F.trim("c_name")).alias("norm_name"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("name_num"),
        F.concat("c_mktsegment", F.lit("|"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_replace(F.lower("c_mktsegment"), "[^a-z0-9]+", "_").alias("slug"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
        F.when(F.col("c_mktsegment").rlike("(?i)^auto"), 1).otherwise(0).alias("is_auto"),
        F.substring("c_mktsegment", 1, 4).alias("seg4"),
    )


@register(
    "datetime_function_suite",
    tags=("P6", "scalar-datetime"),
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS week_before,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderdate
    """,
)
def datetime_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: to_date/date_trunc/date_format/unix_timestamp/
    date_sub/year/month (reference: §2.8 row 2 — toDate, DATE_TRUNC,
    STRFTIME, unix_timestamp, INTERVAL 1 DAY, toYYYYMM)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderdate")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.to_date("o_orderdate").alias("d"),
            # trunc -> DATE, not date_trunc -> TIMESTAMP: date_trunc on an NTZ
            # column round-trips through the session timezone (shifts under a
            # non-UTC driver); month truncation to a DATE is tz-independent
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month_start"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
            # datediff, not unix_timestamp: epoch extraction of a naive
            # timestamp is session-timezone-dependent; day arithmetic is not
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_95"),
            F.date_sub(F.col("o_orderdate").cast("date"), 7).alias("week_before"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            "n",
        )
    )


@register(
    "conditional_null_suite",
    tags=("W3", "W7", "W8", "scalar-conditional"),
    oracle="""
    SELECT s_suppkey AS suppkey,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 1000 THEN 'low'
                WHEN s_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(s_nationkey, 0), -1) AS nation_norm,
           CAST(s_nationkey IS NOT NULL AS INTEGER) AS has_nation,
           CASE WHEN s_acctbal IS NULL OR s_suppkey IS NULL THEN NULL
                ELSE s_acctbal + s_suppkey END AS null_safe_sum,
           GREATEST(s_acctbal, 0.0) AS clamped,
           LEAST(CAST(s_suppkey AS DOUBLE), 50.0) AS capped
    FROM supplier
    """,
)
def conditional_null_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: multi-branch CASE (multiIf), coalesce/nullif
    normalization, isNotNull flag, null-propagating arithmetic,
    greatest/least (reference: §2.8 row 5 — if/multiIf/ifNull/isNull/
    when/otherwise/coalesce)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("suppkey"),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 1000, "low")
        .when(F.col("s_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("s_nationkey", F.lit(0)), F.lit(-1)).alias("nation_norm"),
        F.col("s_nationkey").isNotNull().cast("int").alias("has_nation"),
        (F.col("s_acctbal") + F.col("s_suppkey")).alias("null_safe_sum"),
        F.greatest("s_acctbal", F.lit(0.0)).alias("clamped"),
        F.least(F.col("s_suppkey").cast("double"), F.lit(50.0)).alias("capped"),
    )


@register(
    "math_cast_suite",
    tags=("scalar-math", "P13"),
    oracle="""
    SELECT p_partkey AS partkey,
           CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents,
           ROUND(p_retailprice / (p_size + 1) + 1e-9, 2) AS per_size,
           CAST(p_size AS VARCHAR) AS size_str,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_rt,
           ABS(p_size - 25) AS size_dist,
           p_size % 7 AS size_mod
    FROM part
    """,
)
def math_cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/cast family: *, /, round, abs, %, numeric<->string<->decimal
    round-trips (reference: §2.8 rows 3 and 9). The division is rounded with
    the +1e-9 nudge since its true value is a non-terminating rational."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        # round before the long cast: DuckDB's double->int cast rounds while
        # Spark's truncates, so an explicit round is the only portable form
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
        F.round(F.col("p_retailprice") / (F.col("p_size") + 1) + 1e-9, 2).alias("per_size"),
        F.col("p_size").cast("string").alias("size_str"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("price_rt"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "approx_distinct_users",
    tags=("A-extension",),
    oracle=None,  # HLL estimate is engine-specific; rows-only check
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) vs exact per event_type — the
    approximate-aggregate extension SURVEY §2.5 notes the reference lacks.
    Estimates are engine-specific, so no SQL oracle; a unit test asserts the
    estimate is within 5% of exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )


# --------------------------------------------------------------------------
# ClickHouse URL- and IPv4-function families (r11)
# --------------------------------------------------------------------------
@register(
    "url_function_suite",
    tags=("clickhouse-surface", "scalar-url"),
    oracle=r"""
    WITH u AS (
        SELECT o_orderkey,
               'https://shop-' || LOWER(o_orderstatus) || '.example.co.uk'
                   || '/cat/' || LOWER(REPLACE(o_orderpriority, ' ', '-'))
                   || '/item?id=' || CAST(o_orderkey AS VARCHAR)
                   || '&src=bi' AS url
        FROM orders
    )
    SELECT o_orderkey,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS url_path,
           regexp_extract(url, '\?(.*)$', 1) AS query_string,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS param_id,
           regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                          '([^.]+)$', 1) AS top_level_domain
    FROM u
    """,
)
def url_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL-function family (``protocol`` / ``domain`` /
    ``path`` / ``queryString`` / ``extractURLParameter`` /
    ``topLevelDomain``): URLs are fabricated deterministically from
    order columns JVM-side (the repo's fabricate-then-parse pattern —
    same as the multimodal byte suites), then parsed back with Spark's
    builtin ``parse_url`` (JVM, codegen) — never a Python UDF.  The
    oracle re-parses the same strings with regexes, so any divergence in
    the parser itself shows as a hash mismatch."""
    o = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://shop-"),
        F.lower("o_orderstatus"),
        F.lit(".example.co.uk/cat/"),
        F.lower(F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("-"))),
        F.lit("/item?id="),
        F.col("o_orderkey").cast("string"),
        F.lit("&src=bi"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    host = F.parse_url("url", F.lit("HOST"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        host.alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("url_path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("param_id"),
        F.substring_index(host, ".", -1).alias("top_level_domain"),
    )


@register(
    "ipv4_function_suite",
    tags=("clickhouse-surface", "scalar-ip"),
    oracle="""
    WITH ids AS (SELECT DISTINCT user_id FROM events),
    ip AS (
        SELECT user_id,
               '10.' || CAST((user_id // 65536) % 256 AS VARCHAR)
                     || '.' || CAST((user_id // 256) % 256 AS VARCHAR)
                     || '.' || CAST(user_id % 256 AS VARCHAR) AS ip_str
        FROM ids
    )
    SELECT user_id, ip_str,
           10 * 16777216
             + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip_num,
           CAST(CAST(string_split(ip_str, '.')[2] AS BIGINT) = 0
                AS BIGINT) AS in_10_0_16
    FROM ip
    """,
)
def ipv4_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4-function family (``IPv4NumToString`` /
    ``IPv4StringToNum`` / ``isIPAddressInRange``): a deterministic
    10.x.y.z address is fabricated per distinct user, then parsed BACK
    from the string with split+cast (the string->num direction is the
    one that exercises real parsing) and range-checked against
    10.0.0.0/16.  All JVM string/arithmetic builtins — the oracle
    performs the identical split-and-weigh on the same strings."""
    ev = load_table(spark, sf_dir, "events")
    ids = ev.select("user_id").distinct()
    ip_str = F.concat(
        F.lit("10."),
        ((F.col("user_id") / 65536).cast("long") % 256).cast("string"),
        F.lit("."),
        ((F.col("user_id") / 256).cast("long") % 256).cast("string"),
        F.lit("."),
        (F.col("user_id") % 256).cast("string"),
    )
    ip = ids.select("user_id", ip_str.alias("ip_str"))
    part = lambda i: F.split("ip_str", r"\.").getItem(i).cast("long")
    ip_num = (
        F.lit(10 * 16777216)
        + part(1) * 65536
        + part(2) * 256
        + part(3)
    )
    return ip.select(
        "user_id",
        "ip_str",
        ip_num.alias("ip_num"),
        (part(1) == 0).cast("long").alias("in_10_0_16"),
    )


@register(
    "array_hof_suite",
    tags=("clickhouse-surface", "scalar-array", "hof"),
    oracle="""
    WITH b AS (
        SELECT o_orderkey,
               CAST(o_orderkey % 6 + 2 AS BIGINT) AS n,
               CAST(o_orderkey % 7 + 1 AS BIGINT) AS k
        FROM orders WHERE o_orderkey < 100000
    ),
    a AS (SELECT o_orderkey, k, generate_series(1, n) AS arr FROM b)
    SELECT o_orderkey,
           array_to_string(arr, ',') AS arr,
           array_to_string(list_transform(arr, x -> x * k), ',') AS mapped,
           array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
           CAST(list_sum(arr) AS BIGINT) AS arr_sum,
           array_to_string(list_transform(generate_series(1, len(arr)),
                          i -> list_sum(arr[1:i])), ',') AS cum_sum,
           array_to_string(
               list_sort(list_distinct(list_concat(arr, arr)), 'DESC'), ',')
               AS dedup_desc,
           array_to_string(list_reverse(arr), ',') AS rev,
           array_to_string(arr[2:3], ',') AS sliced,
           CAST(len(list_filter(arr, x -> x > 6)) > 0 AS BIGINT)
               AS has_gt6,
           array_to_string(arr, ',') AS joined
    FROM a
    """,
)
def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array higher-order family (``arrayMap`` /
    ``arrayFilter`` / ``arraySum`` / ``arrayCumSum`` / ``arraySort`` +
    ``arrayDistinct`` / ``arrayReverse`` / ``arraySlice`` /
    ``arrayExists`` / ``arrayStringConcat``): deterministic per-order
    arrays (``sequence(1, orderkey%6+2)``), every op a JVM
    lambda-codegen builtin — ``transform`` / ``filter`` / ``aggregate``
    / ``sort_array`` / ``reverse`` / ``slice`` / ``exists`` /
    ``array_join``.  ``arrayCumSum`` is spelled as transform-with-index
    over slices (quadratic in ELEMENT count — arrays here are <= 7 long;
    the row-stream prefix-sum operators in dq_suite are the scale path
    for long sequences, this is the per-array scalar family)."""
    o = load_table(spark, sf_dir, "orders")
    # key-bounded (pushdown-eligible) so the COMPARE collect stays small
    # at any fixture scale — the suite checks function semantics, not
    # bulk throughput; unbounded array transforms run inside the dedup
    # and llm_text operators
    b = o.where(F.col("o_orderkey") < 100000).select(
        "o_orderkey",
        (F.col("o_orderkey") % 6 + 2).alias("n"),
        (F.col("o_orderkey") % 7 + 1).alias("k"),
    )
    arr = F.sequence(F.lit(1).cast("long"), F.col("n"))
    # the raw array keeps a non-output name so the string-typed "arr"
    # output alias can't shadow it via lateral alias resolution
    b = b.select("o_orderkey", "k", arr.alias("_arr"))
    a = F.col("_arr")
    zero = F.lit(0).cast("long")

    def _s(col):
        # canonical scalar form: the driver canonicalizer can't hash
        # list cells, so every array output leaves as a joined string
        return F.array_join(col.cast("array<string>"), ",")

    return b.select(
        "o_orderkey",
        _s(a).alias("arr"),
        _s(F.transform(a, lambda x: x * F.col("k"))).alias("mapped"),
        _s(F.filter(a, lambda x: x % 2 == 0)).alias("evens"),
        F.aggregate(a, zero, lambda acc, x: acc + x).alias("arr_sum"),
        _s(
            F.transform(
                a,
                lambda x, i: F.aggregate(
                    F.slice(a, 1, i + 1), zero, lambda acc, y: acc + y
                ),
            )
        ).alias("cum_sum"),
        _s(F.sort_array(F.array_distinct(F.concat(a, a)), asc=False)).alias(
            "dedup_desc"
        ),
        _s(F.reverse(a)).alias("rev"),
        _s(F.slice(a, 2, 2)).alias("sliced"),
        F.exists(a, lambda x: x > 6).cast("long").alias("has_gt6"),
        F.array_join(a.cast("array<string>"), ",").alias("joined"),
    )


@register(
    "docs_text_search_suite",
    tags=("clickhouse-surface", "scalar-string", "search"),
    oracle="""
    SELECT doc_id,
           CAST(strpos(text, 'table') AS BIGINT) AS pos_table,
           CAST(len(regexp_extract_all(text, 'value')) AS BIGINT)
               AS matches_value,
           CAST(starts_with(text, 'key') AS BIGINT) AS starts_key,
           CAST(ends_with(text, 'scan') AS BIGINT) AS ends_scan,
           CAST(strpos(text, 'join') > 0 OR strpos(text, 'merge') > 0
                AS BIGINT) AS any_join_merge,
           CAST(strpos(text, 'join') > 0 AND strpos(text, 'scan') > 0
                AS BIGINT) AS all_join_scan
    FROM documents
    """,
)
def docs_text_search_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse text-search family (``position`` / ``countMatches`` /
    ``startsWith`` / ``endsWith`` / ``multiSearchAny`` /
    ``multiSearchAllPositions``-style all-of check) over the documents
    corpus — the substring predicates the reference's quality filters
    compose.  All JVM builtins (``locate`` / ``regexp_count`` /
    ``startswith`` / ``endswith`` / boolean algebra); 1-based position
    with 0 = absent matches both engines' convention."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.locate("table", t).cast("long").alias("pos_table"),
        F.regexp_count(t, F.lit("value")).cast("long").alias("matches_value"),
        F.startswith(t, F.lit("key")).cast("long").alias("starts_key"),
        F.endswith(t, F.lit("scan")).cast("long").alias("ends_scan"),
        ((F.locate("join", t) > 0) | (F.locate("merge", t) > 0))
        .cast("long")
        .alias("any_join_merge"),
        ((F.locate("join", t) > 0) & (F.locate("scan", t) > 0))
        .cast("long")
        .alias("all_join_scan"),
    )


@register(
    "customer_geo_distance_suite",
    tags=("clickhouse-surface", "scalar-geo"),
    oracle="""
    WITH g AS (
        SELECT c_custkey,
               CAST((c_custkey % 160) - 80 + 0.5 AS DOUBLE) AS lat,
               CAST(((c_custkey * 7) % 360) - 180 + 0.5 AS DOUBLE) AS lon
        FROM customer
    )
    SELECT c_custkey, lat, lon,
           ROUND(2 * 6371000.0 * ASIN(SQRT(
               POWER(SIN(RADIANS(lat - 52.52) / 2), 2)
               + COS(RADIANS(lat)) * COS(RADIANS(52.52))
                 * POWER(SIN(RADIANS(lon - 13.405) / 2), 2)
           )) + 1e-9, 2) AS meters_to_berlin,
           CAST(lat BETWEEN 35.0 AND 71.0 AND lon BETWEEN -10.0 AND 40.0
                AS BIGINT) AS in_europe_box
    FROM g
    """,
)
def customer_geo_distance_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse geo family (``greatCircleDistance`` /
    ``pointInEllipses``-style box containment): deterministic lat/lon
    fabricated from customer keys (fabricate-then-compute), haversine
    great-circle distance to a fixed point spelled identically on both
    engines (sin/cos/asin are IEEE to ~1 ulp across JVM and C libm —
    relative 1e-15 on a 2e7 m range is 2e-8 m, closed by 2dp rounding),
    plus a bounding-box predicate.  Pure narrow projection, no
    exchange."""
    c = load_table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 160) - 80 + F.lit(0.5)
    lon = ((F.col("c_custkey") * 7) % 360) - 180 + F.lit(0.5)
    g = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    hav = (
        F.pow(F.sin(F.radians(F.col("lat") - 52.52) / 2), 2)
        + F.cos(F.radians("lat"))
        * F.cos(F.radians(F.lit(52.52)))
        * F.pow(F.sin(F.radians(F.col("lon") - 13.405) / 2), 2)
    )
    return g.select(
        "c_custkey",
        "lat",
        "lon",
        F.round(
            2 * 6371000.0 * F.asin(F.sqrt(hav)) + F.lit(1e-9), 2
        ).alias("meters_to_berlin"),
        (
            F.col("lat").between(35.0, 71.0)
            & F.col("lon").between(-10.0, 40.0)
        )
        .cast("long")
        .alias("in_europe_box"),
    )
