"""Recursive-JSON-flatten plans — the notebook-cell-16 surface, oracled.

The reference explores rejected payloads by recursively flattening nested
JSON driver-side (duckdb_olap.ipynb cell 16, pandas json_normalize). These
plans prove the Spark-native equivalents (functions/json_flat.py) on the
fixture tables with round-trip oracles: the payload is BUILT from table
columns JVM-side (to_json of nested structs), flattened back through the
operator under test, and aggregated — DuckDB computes the same aggregates
straight from the raw columns, so any flattening defect breaks the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import register
from ..functions.json_flat import flatten_array_of_struct, flatten_json, json_kv_rows
from ..sources.tables import load_table

#: 3-level rejected-payload shape: id + meta{type,val} + ctx{who{uid}}
_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("val", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "ctx",
            T.StructType(
                [T.StructField("who", T.StructType([T.StructField("uid", T.LongType())]))]
            ),
        ),
    ]
)


def _nested_payload(ev: DataFrame) -> DataFrame:
    """events rows re-serialized as a 3-deep nested JSON payload — the shape
    of an unknown rejected message."""
    payload = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(
                F.col("event_type").alias("type"), F.col("value").alias("val")
            ).alias("meta"),
            F.struct(
                F.struct(F.col("user_id").alias("uid")).alias("who")
            ).alias("ctx"),
        )
    )
    return ev.select(payload.alias("json_str"))


@register(
    "rejected_payload_flatten",
    tags=("§2.8", "JSON", "W4"),
    oracle="""
    SELECT event_type AS meta_type,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(MIN(value) + 1e-9, 4) AS vmin,
           ROUND(MAX(value) + 1e-9, 4) AS vmax
    FROM events
    GROUP BY 1
    """,
)
def rejected_payload_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven recursive flatten (notebook cell 16 equivalent): a
    3-level nested payload is star-expanded into path-joined columns
    (id, meta_type, meta_val, ctx_who_uid) in ONE codegen projection, then
    aggregated. The oracle aggregates the raw columns directly — the match
    proves build->flatten is lossless at every nesting level."""
    ev = load_table(spark, sf_dir, "events")
    flat = flatten_json(_nested_payload(ev), "json_str", _PAYLOAD_SCHEMA)
    return flat.groupBy(F.col("meta_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
        F.count_distinct("ctx_who_uid").alias("n_users"),
        F.round(F.min("meta_val") + 1e-9, 4).alias("vmin"),
        F.round(F.max("meta_val") + 1e-9, 4).alias("vmax"),
    )


@register(
    "payload_kv_exploded",
    tags=("§2.8", "JSON"),
    oracle="""
    SELECT 'k' AS j_key, COUNT(*) AS n,
           COUNT(DISTINCT COALESCE(json_extract_string(props, '$.k'), '-1')) AS n_vals
    FROM events
    UNION ALL
    SELECT 't' AS j_key, COUNT(*) AS n,
           COUNT(DISTINCT COALESCE(event_type, '?')) AS n_vals
    FROM events
    """,
)
def payload_kv_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-FREE flatten fallback: unknown payloads become (key, value)
    rows via map<string,string> parsing + explode — no declared schema, no
    driver loop. Grouping by key profiles an unknown payload population
    (which keys exist, with what cardinality) — the first question anyone
    asks of a rejected lake."""
    ev = load_table(spark, sf_dir, "events")
    js = F.to_json(
        F.struct(
            F.coalesce(
                F.get_json_object("props", "$.k").cast("long"), F.lit(-1)
            ).alias("k"),
            F.coalesce(F.col("event_type"), F.lit("?")).alias("t"),
        )
    )
    rows = json_kv_rows(ev.select(js.alias("json_str")), "json_str")
    return rows.groupBy("j_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("j_value").alias("n_vals"),
    )


@register(
    "array_of_struct_flatten",
    tags=("§2.8", "W5", "JSON"),
    oracle="""
    SELECT n_nationkey AS nid, 0 AS items_idx, 'a' AS tag,
           CAST(n_nationkey AS BIGINT) AS v
    FROM nation
    UNION ALL
    SELECT n_nationkey AS nid, 1 AS items_idx, 'b' AS tag,
           CAST(n_nationkey * 2 AS BIGINT) AS v
    FROM nation
    """,
)
def array_of_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_normalize's record_path as a relational operator: ONE
    array-of-struct column explodes to child rows (with element index) and
    the element fields flatten recursively."""
    n = load_table(spark, sf_dir, "nation")
    items = F.array(
        F.struct(F.lit("a").alias("tag"), F.col("n_nationkey").cast("long").alias("v")),
        F.struct(
            F.lit("b").alias("tag"), (F.col("n_nationkey") * 2).cast("long").alias("v")
        ),
    )
    df = n.select(F.col("n_nationkey").alias("nid"), items.alias("items"))
    return flatten_array_of_struct(df, "items", keep=["nid"])
