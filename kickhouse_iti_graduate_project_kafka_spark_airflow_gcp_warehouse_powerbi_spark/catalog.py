"""Query catalog — the single registry behind ``__spark_entry__.py``.

Every operator family from SURVEY.md §2 is exercised by at least one named
query here. Each entry carries:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark plan (aliased columns);
- ``oracle`` — equivalent DuckDB SQL over the same parquet views, or ``None``
  for genuinely non-SQL-expressible operators (the driver then records a
  rows-only check);
- ``bench`` — whether the query is part of the headline benchmark suite.

Column-naming contract: Spark aliases and oracle ``AS`` names must be
identical — the driver sorts columns by name before value-hashing.
Float outputs are rounded *in the query on both sides* so value hashes are
stable across summation orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, bench=bench, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plans module so its @register calls run, then return
    the registry."""
    from .plans import (  # noqa: F401
        aggregates,
        curation,
        dq_suite,
        json_flatten,
        llm_text,
        llm_vectors,
        mergetree,
        retrieval,
        scalars,
        stats,
        temporal,
        tpch,
        validator,
        warehouse,
    )

    return REGISTRY
