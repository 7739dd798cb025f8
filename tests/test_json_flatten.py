"""Recursive JSON flattener (functions/json_flat.py) — notebook cell 16's
surface: schema-driven deep flatten, schema-free kv fallback, array-of-
struct record_path."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.json_flat import (
    flatten_array_of_struct,
    flatten_json,
    flatten_struct_cols,
    json_kv_rows,
    leaf_paths,
)

DEEP = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField(
            "b",
            T.StructType(
                [
                    T.StructField("c", T.StringType()),
                    T.StructField(
                        "d", T.StructType([T.StructField("e", T.DoubleType())])
                    ),
                ]
            ),
        ),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)


def test_leaf_paths_depth_first():
    assert [(p, type(t).__name__) for p, t in leaf_paths(DEEP)] == [
        (("a",), "LongType"),
        (("b", "c"), "StringType"),
        (("b", "d", "e"), "DoubleType"),
        (("arr",), "ArrayType"),  # arrays are leaves, not exploded
    ]


def test_flatten_json_three_levels(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, js='{"a": 7, "b": {"c": "x", "d": {"e": 2.5}}, "arr": [1, 2]}'),
            Row(id=2, js='{"a": 8, "b": {"c": "y"}}'),  # missing subtree -> NULLs
            Row(id=3, js="not json at all"),  # malformed -> all NULL leaves
        ]
    )
    out = flatten_json(df, "js", DEEP, keep=["id"])
    assert out.columns == ["id", "a", "b_c", "b_d_e", "arr"]
    rows = {r["id"]: r for r in out.collect()}
    assert (rows[1]["a"], rows[1]["b_c"], rows[1]["b_d_e"], rows[1]["arr"]) == (
        7, "x", 2.5, [1, 2],
    )
    assert rows[2]["b_d_e"] is None and rows[2]["b_c"] == "y"
    assert rows[3]["a"] is None and rows[3]["b_c"] is None


def test_flatten_struct_cols_passthrough(spark):
    df = spark.createDataFrame([Row(id=1, s=Row(x=2, y=Row(z=3)))])
    out = flatten_struct_cols(df)
    assert out.columns == ["id", "s_x", "s_y_z"]
    assert out.collect()[0] == Row(id=1, s_x=2, s_y_z=3)


def test_json_kv_rows_unknown_payloads(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, js='{"k": 69, "tag": "x", "nested": {"a": 1}}'),
            Row(id=2, js="garbage"),  # malformed: one (NULL, NULL) row
        ]
    )
    out = json_kv_rows(df, "js", keep=["id"]).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], {})[r["j_key"]] = r["j_value"]
    assert by_id[1]["k"] == "69" and by_id[1]["tag"] == "x"
    # nested objects surface as JSON text — feed back through for level 2
    assert by_id[1]["nested"] == '{"a":1}'
    assert by_id[2] == {None: None}  # malformed rows are kept, not dropped

    # second pass over the nested value: bounded explicit recursion
    lvl2 = spark.createDataFrame([Row(js=by_id[1]["nested"])])
    assert json_kv_rows(lvl2, "js").collect()[0].asDict() == {"j_key": "a", "j_value": "1"}


def test_flatten_array_of_struct_record_path(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "items",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("tag", T.StringType()),
                            T.StructField(
                                "m", T.StructType([T.StructField("v", T.LongType())])
                            ),
                        ]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, [("a", (10,)), ("b", (20,))]),
            (2, []),  # empty array: no child rows
        ],
        schema,
    )
    out = flatten_array_of_struct(df, "items", keep=["id"])
    assert out.columns == ["id", "items_idx", "tag", "m_v"]
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, 0, "a", 10), (1, 1, "b", 20)]


def test_flatten_array_of_struct_rejects_scalar_arrays(spark):
    df = spark.createDataFrame([Row(id=1, arr=[1, 2])])
    try:
        flatten_array_of_struct(df, "arr")
        raise AssertionError("expected TypeError")
    except TypeError:
        pass
