"""ClickHouse ``sumMap`` / ``minMap`` / ``maxMap`` as reusable operators.

The reference warehouse's ClickHouse layer aggregates map-shaped
metrics (counter maps per row — e.g. status→count, code→latency) with
the ``-Map`` combinator family: per group, values are combined PER KEY
across all rows' maps, and the result is a pair of aligned arrays
``([sorted keys], [combined values])`` (ClickHouse SQL reference,
``sumMap``).

Spark-first shape: the map entries are exploded to rows (generator, no
shuffle), combined with an ordinary hash aggregation on
``(group, key)`` — which is exactly the distributed spelling of
ClickHouse's per-arena hash map, with map-side partial combine — and
re-assembled into the aligned-array form with one more small
aggregation.  Two exchanges total, both on keys; no window, no Python.
Key-cardinality per group bounds the final collect_list (the same bound
ClickHouse's in-memory result map has).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINERS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def agg_map(
    df: DataFrame,
    keys: Column,
    values: Column,
    by: Sequence[str] = (),
    combine: str = "sum",
    emit_empty_groups: bool = False,
) -> DataFrame:
    """ClickHouse ``sumMap(keys, values)`` (``combine='sum'``) /
    ``minMap`` / ``maxMap`` per ``by`` group.

    ``keys`` and ``values`` are equal-length array columns (the
    ClickHouse calling convention; a row where both are non-null but the
    lengths differ fails the job with a ``raise_error`` — ClickHouse's
    sumMap errors on size mismatch too, and silently zip-padding with
    NULL entries would corrupt per-key sums); returns ``*by, map_keys,
    map_values`` where ``map_keys`` is the sorted distinct key array and
    ``map_values`` the per-key combined values aligned to it — the
    deterministic serialization of the result map (ClickHouse sorts its
    result keys the same way, and sorted arrays are what a cross-engine
    oracle can hash).

    Groups whose rows ALL carry empty or NULL arrays contribute no map
    entries; by default they are DROPPED from the result (the explode
    discards them — ClickHouse likewise has no state to emit).  Pass
    ``emit_empty_groups=True`` to keep one row per distinct ``by`` key
    with empty ``map_keys``/``map_values`` arrays instead (one extra
    aggregation on the same grouping key — AQE broadcasts the small
    side).
    """
    if combine not in _COMBINERS:
        raise ValueError(
            f"combine must be one of {sorted(_COMBINERS)}, got {combine!r}"
        )
    comb = _COMBINERS[combine]
    # NULL on either side never reaches the zip (explode drops it — the
    # row carries no entries); a REAL length mismatch is a caller bug
    size_ok = (
        keys.isNull()
        | values.isNull()
        | (F.size(keys) == F.size(values))
    )
    zipped = F.when(
        size_ok, F.arrays_zip(keys.alias("k"), values.alias("v"))
    ).otherwise(
        F.raise_error(
            F.lit("agg_map: keys and values arrays must be equal length")
        )
    )
    exploded = df.select(
        *by, F.explode(zipped).alias("_e")
    ).select(*by, F.col("_e.k").alias("_k"), F.col("_e.v").alias("_v"))
    per_key = exploded.groupBy(*by, "_k").agg(comb("_v").alias("_c"))
    pairs = per_key.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct(F.col("_k"), F.col("_c")))).alias(
            "_p"
        )
    )
    out = pairs.select(
        *by,
        F.transform("_p", lambda p: p["_k"]).alias("map_keys"),
        F.transform("_p", lambda p: p["_c"]).alias("map_values"),
    )
    if emit_empty_groups and by:
        all_groups = df.select(*by).distinct()
        out = all_groups.join(out, list(by), "left").select(
            *by,
            F.coalesce(
                "map_keys", F.array().cast(out.schema["map_keys"].dataType)
            ).alias("map_keys"),
            F.coalesce(
                "map_values",
                F.array().cast(out.schema["map_values"].dataType),
            ).alias("map_values"),
        )
    return out
