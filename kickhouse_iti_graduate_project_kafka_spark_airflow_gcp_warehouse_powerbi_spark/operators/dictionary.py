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
        ``defaults[out_col]`` when given (``dictGetOrDefault``).

        The default applies ONLY when the key is absent from the
        dictionary (key-presence test on the joined key, not a coalesce
        over the attribute): ClickHouse ``dictGetOrDefault`` returns a
        present key's Nullable-attribute NULL as NULL, never the
        default."""
        wanted = tuple(dict.fromkeys(attr_map.values()))
        joined, kcol = self._lookup(df, key, wanted)
        out = joined
        for out_col, attr in attr_map.items():
            col = F.col(f"{kcol}_{attr}")
            if defaults and out_col in defaults:
                col = F.when(
                    F.col(kcol).isNull(), F.lit(defaults[out_col])
                ).otherwise(col)
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


def dict_get_hierarchy(
    df: DataFrame,
    dictionary: Dictionary,
    parent_attr: str,
    key: Column | str,
    out_col: str = "hierarchy",
    *,
    max_depth: int = 8,
    on_truncated: str = "flag",
) -> DataFrame:
    """``dictGetHierarchy``: the ancestor chain ``[key, parent, …]`` as an
    array column, walking ``parent_attr`` links in the dictionary.

    ClickHouse hierarchical dictionaries resolve the chain against the
    per-server hash table; here each level is one more broadcast hash
    probe — ``max_depth`` bounds the plan (hierarchies are category
    trees, shallow by construction; ClickHouse likewise cuts cycles by
    bounding the walk). A key absent from the dictionary contributes
    just ``[key]``; the chain stops at the first NULL parent. The fact
    side never shuffles, as with every lookup in this module.

    A chain still growing after ``max_depth`` probes is NEVER returned
    silently shortened (a shortened chain is a false-negative
    ``dict_is_in``). ``on_truncated`` picks the surfacing:

    - ``"flag"`` (default): adds a boolean ``{out_col}_truncated``
      column — loud but non-fatal, so pipelines over deep/cyclic
      dictionary data keep running (ClickHouse itself silently bounds
      the walk; the flag is the diagnosable version of that).
    - ``"error"``: one extra probe of the final tail; a still-growing
      chain raises at execution time (JVM-side ``raise_error``, no
      driver action) naming the key and depth. Opt in where a shortened
      chain must abort the job.
    - ``"ignore"``: the exact ClickHouse bounded-walk behavior (skips
      the extra probe and the flag column).
    """
    if on_truncated not in ("error", "flag", "ignore"):
        raise ValueError("on_truncated must be 'error', 'flag' or 'ignore'")
    key = F.col(key) if isinstance(key, str) else key
    out = df.withColumn(out_col, F.array(key.cast("long")))
    for i in range(max_depth):
        # Probe the parent of the chain's current tail. Once a chain has
        # stopped (its tail's parent resolved NULL), re-probing the tail
        # keeps resolving NULL, so stopped chains stay stopped.
        step = f"_hier{i}"
        out = dictionary.get(
            out, {step: parent_attr}, F.element_at(F.col(out_col), -1)
        )
        parent = F.col(step).cast("long")
        tail = F.element_at(F.col(out_col), -1)
        # self-parented roots (a common "no parent" encoding alongside
        # NULL) must not loop; longer cycles are cut by max_depth
        out = out.withColumn(
            out_col,
            F.when(
                parent.isNotNull() & (parent != tail),
                F.concat(F.col(out_col), F.array(parent)),
            ).otherwise(F.col(out_col)),
        ).drop(step)
    if on_truncated == "ignore":
        return out
    # One more probe of the final tail: a non-self, non-NULL parent here
    # means the walk was cut by max_depth, not by reaching a root.
    step = "_hier_probe"
    out = dictionary.get(out, {step: parent_attr}, F.element_at(F.col(out_col), -1))
    parent = F.col(step).cast("long")
    tail = F.element_at(F.col(out_col), -1)
    growing = parent.isNotNull() & (parent != tail)
    if on_truncated == "flag":
        return out.withColumn(f"{out_col}_truncated", growing).drop(step)
    return out.withColumn(
        out_col,
        F.when(
            growing,
            F.raise_error(
                F.concat(
                    F.lit("dict_get_hierarchy: chain for key "),
                    F.element_at(F.col(out_col), 1).cast("string"),
                    F.lit(f" still growing at max_depth={max_depth}"),
                )
            ).cast(out.schema[out_col].dataType.simpleString()),
        ).otherwise(F.col(out_col)),
    ).drop(step)


def dict_is_in(
    df: DataFrame,
    dictionary: Dictionary,
    parent_attr: str,
    child_key: Column | str,
    ancestor_key: Column | str,
    out_col: str = "is_in",
    *,
    max_depth: int = 8,
    on_truncated: str = "flag",
) -> DataFrame:
    """``dictIsIn``: true iff ``ancestor_key`` appears in ``child_key``'s
    ancestor chain (the chain includes the child itself, matching the
    documented ClickHouse behavior). A ``max_depth``-truncated chain
    would silently answer false for deeper ancestors, so truncation
    surfaces per ``on_truncated`` (default: a ``{out_col}_truncated``
    flag column; pass ``"error"`` to abort instead)."""
    anc = F.col(ancestor_key) if isinstance(ancestor_key, str) else ancestor_key
    tmp = f"_isin{len(df.columns)}"
    walked = dict_get_hierarchy(
        df, dictionary, parent_attr, child_key, tmp,
        max_depth=max_depth, on_truncated=on_truncated,
    )
    if on_truncated == "flag":
        walked = walked.withColumnRenamed(
            f"{tmp}_truncated", f"{out_col}_truncated"
        )
    return walked.withColumn(
        out_col, F.array_contains(F.col(tmp), anc.cast("long"))
    ).drop(tmp)
