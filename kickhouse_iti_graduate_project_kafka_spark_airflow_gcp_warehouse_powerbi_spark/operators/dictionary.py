"""ClickHouse external-dictionary lookups (``dictGet`` family), Spark-first.

ClickHouse loads a small dimension table into an in-memory hash structure
on every server and resolves ``dictGet('d', 'attr', key)`` /
``dictGetOrDefault`` / ``dictHas`` per fact row without a user-visible
join — the idiom a DirectQuery BI layer over the reference's star schema
(reference: README.md Power BI model over the ClickHouse warehouse,
``ClickHouse Data Warehouse Creation + Backfill DDLs.txt`` dims) leans on
for dim enrichment.

Spark-first mapping: a dictionary IS a broadcast hash relation. The
lookup is declared as a **broadcast LEFT join** against a one-row-per-key
collapse of the dim, so

- Catalyst keeps the probe inside whole-stage codegen (no Python, no UDF);
- the fact side never shuffles — at 100 TB the dim is a per-executor hash
  map, exactly ClickHouse's dictionary memory model;
- missing keys surface as NULL (``dict_get``), a default
  (``dict_get_or_default``), or a boolean (``dict_has``) — matching the
  documented ClickHouse behaviors.

ClickHouse dictionaries require unique keys; arbitrary-dup sources keep
one row ("any"). We make that deterministic: the dim collapses with
``min(struct(attrs))`` per key before broadcasting, so a lookup can never
fan out fact rows and repeated runs pick the same row. The collapse runs
on dictionary-sized data (a true dim), so it is broadcast-cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    """A keyed, one-row-per-key dim relation ready for broadcast lookups.

    ``source`` is any DataFrame; ``key_col`` its lookup key; ``attrs`` the
    attribute columns exposed to ``dict_get`` (default: every non-key
    column). Duplicate keys are collapsed deterministically (min struct).
    """

    def __init__(
        self,
        source: DataFrame,
        key_col: str,
        attrs: tuple[str, ...] | None = None,
        *,
        assume_unique: bool = False,
    ):
        self.key_col = key_col
        self.attrs = tuple(attrs) if attrs else tuple(
            c for c in source.columns if c != key_col
        )
        if assume_unique:
            # Caller-asserted unique keys: skip the collapse (and its
            # dim-side shuffle). A duplicate key would fan out fact rows —
            # only safe for true pk-keyed dims.
            self.relation = source.select(key_col, *self.attrs)
        else:
            self.relation = (
                source.select(key_col, *self.attrs)
                .groupBy(key_col)
                .agg(F.min(F.struct(*self.attrs)).alias("_row"))
                .select(key_col, *[F.col(f"_row.{a}").alias(a) for a in self.attrs])
            )

    def _lookup(
        self, df: DataFrame, key: Column | str, wanted: tuple[str, ...]
    ) -> tuple[DataFrame, str]:
        key = F.col(key) if isinstance(key, str) else key
        # Unique probe-side aliases so chained lookups on the same dict
        # (or a self-referential dim) never collide.
        n = sum(1 for c in df.columns if c.startswith("_dict_k"))
        kcol = f"_dict_k{n}"
        rel = self.relation.select(
            F.col(self.key_col).alias(kcol),
            *[F.col(a).alias(f"{kcol}_{a}") for a in wanted],
        )
        joined = df.join(F.broadcast(rel), key == F.col(kcol), "left")
        return joined, kcol

    def get(
        self,
        df: DataFrame,
        attr_map: dict[str, str],
        key: Column | str,
        *,
        defaults: dict[str, object] | None = None,
    ) -> DataFrame:
        """``dictGet`` / ``dictGetOrDefault``: add ``out_col -> attr``
        lookup columns to ``df``. Missing keys yield NULL, or
        ``defaults[out_col]`` when given (``dictGetOrDefault``)."""
        wanted = tuple(dict.fromkeys(attr_map.values()))
        joined, kcol = self._lookup(df, key, wanted)
        out = joined
        for out_col, attr in attr_map.items():
            col = F.col(f"{kcol}_{attr}")
            if defaults and out_col in defaults:
                col = F.coalesce(col, F.lit(defaults[out_col]))
            out = out.withColumn(out_col, col)
        return out.drop(kcol, *[f"{kcol}_{a}" for a in wanted])

    def has(self, df: DataFrame, out_col: str, key: Column | str) -> DataFrame:
        """``dictHas``: boolean column — does the key exist in the dict."""
        joined, kcol = self._lookup(df, key, ())
        return joined.withColumn(out_col, F.col(kcol).isNotNull()).drop(kcol)


def dict_get(
    df: DataFrame,
    dictionary: Dictionary,
    attr_map: dict[str, str],
    key: Column | str,
    *,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Functional spelling of :meth:`Dictionary.get`."""
    return dictionary.get(df, attr_map, key, defaults=defaults)


def dict_has(df: DataFrame, dictionary: Dictionary, out_col: str, key: Column | str) -> DataFrame:
    """Functional spelling of :meth:`Dictionary.has`."""
    return dictionary.has(df, out_col, key)
