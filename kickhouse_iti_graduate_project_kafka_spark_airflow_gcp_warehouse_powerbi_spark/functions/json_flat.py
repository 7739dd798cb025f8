"""Recursive JSON flattening — schema-driven and schema-free paths.

The reference flattens arbitrarily nested rejected payloads driver-side in
Python (airflow/dags/duckDB/duckdb_olap.ipynb cell 16: pandas
json_normalize over the rejected lake). That approach pulls every payload
through the driver; at 100 TB it is a non-starter. The Spark-native
re-expression is:

- **flatten_json / flatten_struct_cols** — when a payload schema is known
  (or inferrable from a sample): ``from_json`` + ONE projection that
  star-expands every nested struct into path-joined top-level columns
  (``a.b.c`` -> ``a_b_c``). Pure narrow transform, whole-stage codegen,
  no Python, no extra pass per nesting level.
- **json_kv_rows** — the dynamic fallback for *unknown* payloads:
  ``from_json(col, 'map<string,string>')`` + ``explode_outer`` yields
  (key, value) rows for any JSON object without declaring a schema.
  Nested objects surface as JSON strings and can be fed back through the
  same operator for one more level — bounded, explicit recursion instead
  of a driver loop.
- **flatten_array_of_struct** — explodes ONE array-of-struct column into
  child rows (with the element index) and flattens the element fields;
  the relational equivalent of json_normalize's record_path.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def leaf_paths(
    schema: T.StructType, prefix: tuple[str, ...] = ()
) -> Iterator[tuple[tuple[str, ...], T.DataType]]:
    """Yield (path, dtype) for every non-struct leaf, depth-first in schema
    order. Arrays/maps are leaves (kept intact — exploding is a separate,
    row-multiplying decision; see flatten_array_of_struct)."""
    for f in schema.fields:
        if isinstance(f.dataType, T.StructType):
            yield from leaf_paths(f.dataType, prefix + (f.name,))
        else:
            yield prefix + (f.name,), f.dataType


def _flat_cols(
    root: Column, schema: T.StructType, sep: str, prefix: tuple[str, ...] = ()
) -> list[Column]:
    cols = []
    for path, _ in leaf_paths(schema):
        c = root
        for part in path:
            c = c.getField(part)
        cols.append(c.alias(sep.join(prefix + path)))
    return cols


def flatten_struct_cols(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively star-expand every StructType column of ``df`` into
    path-joined top-level columns; non-struct columns pass through. One
    projection regardless of nesting depth — schema recursion happens at
    plan-build time, not per row."""
    out: list[Column] = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            # the struct column's own name heads the path: s.y.z -> s_y_z
            out.extend(_flat_cols(F.col(f.name), f.dataType, sep, prefix=(f.name,)))
        else:
            out.append(F.col(f.name))
    return df.select(*out)


def flatten_json(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    sep: str = "_",
    keep: Sequence[str] = (),
) -> DataFrame:
    """Parse ``json_col`` with ``schema`` and emit one column per nested
    leaf, named by its ``sep``-joined path. ``keep`` lists passthrough
    columns from ``df``. Malformed rows yield NULL leaves (from_json
    PERMISSIVE mode) — route them via a corrupt-record column upstream if
    they must be split out (streaming/validate.py does)."""
    parsed = F.from_json(F.col(json_col), schema)
    return df.select(*[F.col(c) for c in keep], *_flat_cols(parsed, schema, sep))


def json_kv_rows(
    df: DataFrame, json_col: str, keep: Sequence[str] = ()
) -> DataFrame:
    """Schema-free fallback: one (j_key, j_value string) row per top-level
    entry of the JSON object. Nested objects/arrays arrive as their JSON
    text (feed back through for another level). Non-object / malformed
    input yields a single (NULL, NULL) row, so rows are never silently
    dropped."""
    kv = F.from_json(F.col(json_col), "map<string,string>")
    return df.select(
        *[F.col(c) for c in keep], F.explode_outer(kv).alias("j_key", "j_value")
    )


def flatten_array_of_struct(
    df: DataFrame,
    array_col: str,
    keep: Sequence[str] = (),
    sep: str = "_",
) -> DataFrame:
    """Explode one array-of-struct column into child rows: ``keep`` columns
    + ``<array_col>_idx`` + one column per (recursively flattened) element
    field. Empty/NULL arrays produce no rows (inner explode) — union with a
    parent query if orphans must be preserved."""
    elem_type = df.schema[array_col].dataType.elementType
    if not isinstance(elem_type, T.StructType):
        raise TypeError(f"{array_col} must be array<struct<...>>, got {elem_type}")
    exploded = df.select(
        *[F.col(c) for c in keep],
        F.posexplode(array_col).alias(f"{array_col}_idx", "_elem"),
    )
    return exploded.select(
        *[F.col(c) for c in keep],
        F.col(f"{array_col}_idx"),
        *_flat_cols(F.col("_elem"), elem_type, sep),
    )
