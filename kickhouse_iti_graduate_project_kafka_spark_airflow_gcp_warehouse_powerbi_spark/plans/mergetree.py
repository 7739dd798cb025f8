"""Catalog queries driving the parts-table (MergeTree) lifecycle.

Each query BUILDS a real on-disk parts table from the fixture (memoized
per process+sf_dir so a 160-query sweep pays the build once), then reads
it back — so the driver's oracle gate covers the persisted lifecycle
(insert → commit → FINAL / time travel), not just an in-memory plan.
The oracles replay the engine semantics closed-form over the raw orders
view: part sequence k+1 holds the ``o_orderkey % 3 == k`` slice, and the
replacing order is VERSION-DOMINANT (ClickHouse ReplacingMergeTree(ver):
max version wins regardless of part order; the part sequence only breaks
version ties). With ``version_col=o_orderkey`` unique, FINAL is exactly a
ROW_NUMBER over ``o_orderkey DESC`` — the part assignment drops out.

Ref parity: ClickHouse DDL 143-146 (MergeTree family), README.md:96-133
(insert blocks → parts with retry dedup), README.md:475-477 (FINAL-style
latest-state reads).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.parts import (
    aggregate_states,
    create_parts_table,
    insert_into_parts,
    optimize_parts,
    read_parts,
)
from ..sources.tables import load_table

_BUILT: dict[tuple[str, str], str] = {}


@atexit.register
def _cleanup_built() -> None:
    """The memoized fixture tables live in per-process tmpdirs; sweep
    them at interpreter exit so repeated sweeps don't litter /tmp."""
    for path in _BUILT.values():
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def _orders_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )


def _replacing_table(spark: SparkSession, sf_dir: str) -> str:
    """orders as a replacing table, inserted in 3 batches by orderkey mod 3."""
    key = (sf_dir, "replacing")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_replacing"
        create_parts_table(
            path, engine="replacing", key_cols=("custkey",), version_col="orderkey"
        )
        orders = _orders_slim(spark, sf_dir)
        for k in range(3):
            insert_into_parts(orders.filter(F.col("orderkey") % 3 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


def _summing_table(spark: SparkSession, sf_dir: str) -> str:
    """customer spend as a summing table: exact DECIMAL money + a unit
    counter column, so merge-time sums are order-independent."""
    key = (sf_dir, "summing")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_summing"
        create_parts_table(
            path,
            engine="summing",
            key_cols=("custkey",),
            sum_cols=("total_spend", "n_orders"),
        )
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("total_spend"),
            F.lit(1).cast("long").alias("n_orders"),
        )
        for k in range(3):
            insert_into_parts(orders.filter(F.col("custkey") % 3 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_replacing_final",
    bench=True,
    tags=("S10", "A6", "mergetree", "replacing-final"),
    oracle="""
    SELECT custkey, orderkey, status, totalprice
    FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               o_orderstatus AS status, o_totalprice AS totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def orders_parts_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree FINAL through the persisted lifecycle: orders
    land in three insert batches (parts); FINAL keeps, per customer, the
    row with the MAX version column (version-dominant, part sequence only
    breaking ties) — with the unique orderkey as version, the oracle is a
    plain max-orderkey window, independent of the part assignment."""
    path = _replacing_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "custkey", "orderkey", "status", "totalprice"
    )


@register(
    "orders_parts_summing_final",
    bench=False,
    tags=("S10", "A1", "mergetree", "summing-final"),
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def orders_parts_summing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree FINAL: per-customer spend accumulated across three
    parts — exact-decimal money and a summed unit counter, so the merge
    result equals a plain GROUP BY regardless of part boundaries."""
    path = _summing_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "custkey",
        F.col("total_spend").cast("double").alias("total_spend"),
        "n_orders",
    )


@register(
    "orders_parts_timetravel",
    bench=False,
    tags=("S10", "A10", "mergetree", "time-travel"),
    oracle="""
    SELECT t.v AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders, (VALUES (1), (2), (3)) AS t(v)
    WHERE o_orderkey % 3 < t.v
    GROUP BY t.v
    """,
)
def orders_parts_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: each retained version is a consistent snapshot — the
    cumulative mod-3 slices — so (count, exact revenue) per version is
    closed-form. Reads version pins, not the latest manifest."""
    path = _replacing_table(spark, sf_dir)
    legs = []
    for v in (1, 2, 3):
        legs.append(
            read_parts(spark, path, version=v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("totalprice").cast("decimal(14,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .withColumn("version", F.lit(v))
        )
    df = legs[0]
    for leg in legs[1:]:
        df = df.unionByName(leg)
    return df.select("version", "n_rows", "revenue")


def _collapsing_table(spark: SparkSession, sf_dir: str) -> str:
    """orders as a VersionedCollapsing table — a CDC-style mutation
    history: batch 1 states every order at version 1; batch 2 cancels the
    ``orderkey % 5 == 0`` slice and restates it at version 2 (status 'R',
    price doubled); batch 3 cancels the ``orderkey % 7 == 1`` slice at
    its then-current version, with no restate (a delete)."""
    key = (sf_dir, "collapsing")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_collapsing"
        create_parts_table(
            path,
            engine="collapsing",
            key_cols=("orderkey",),
            sign_col="sign",
            version_col="ver",
        )
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        )
        v = lambda n: F.lit(n).cast("long").alias("ver")  # noqa: E731
        s = lambda n: F.lit(n).cast("int").alias("sign")  # noqa: E731
        insert_into_parts(
            o.select("orderkey", v(1), s(1), "status", "price"), path, batch_id=0
        )
        repl = o.filter(F.col("orderkey") % 5 == 0)
        insert_into_parts(
            repl.select("orderkey", v(1), s(-1), "status", "price").unionByName(
                repl.select(
                    "orderkey",
                    v(2),
                    s(1),
                    F.lit("R").alias("status"),
                    (F.col("price") * 2).alias("price"),
                )
            ),
            path,
            batch_id=1,
        )
        gone = o.filter(F.col("orderkey") % 7 == 1)
        insert_into_parts(
            gone.select(
                "orderkey",
                F.when(F.col("orderkey") % 5 == 0, F.lit(2))
                .otherwise(F.lit(1))
                .cast("long")
                .alias("ver"),
                s(-1),
                "status",
                "price",
            ),
            path,
            batch_id=2,
        )
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_collapsing_final",
    bench=True,
    tags=("S10", "A6", "mergetree", "collapsing-final"),
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS BIGINT) AS ver,
           CASE WHEN o_orderkey % 5 = 0 THEN 'R' ELSE o_orderstatus END AS status,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS price
    FROM orders
    WHERE o_orderkey % 7 <> 1
    """,
)
def orders_parts_collapsing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL through the persisted lifecycle
    (CDC updates AND deletes over parts): updated keys surface only their
    version-2 restate, deleted keys disappear entirely — the oracle
    replays the whole mutation history closed-form from the mod-5 / mod-7
    batch recipe. Doubling a double is exact (one bit of exponent), so
    the restated price is bitwise-comparable cross-engine."""
    path = _collapsing_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "orderkey", "ver", "status", "price"
    )


_AGG_SPEC = {
    "n_orders": "sum",
    "total_spend": "sum",
    "min_price": "min",
    "max_price": "max",
}


def _aggregating_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-customer order stats as an aggregating table: three insert
    batches sliced by ORDER key (so the same customer's partial states
    land in several parts and must genuinely merge), each pre-aggregated
    to state rows with aggregate_states."""
    key = (sf_dir, "aggregating")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_aggregating"
        create_parts_table(
            path, engine="aggregating", key_cols=("custkey",), agg_spec=_AGG_SPEC
        )
        raw = load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.lit(1).cast("long").alias("n_orders"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("total_spend"),
            F.col("o_totalprice").alias("min_price"),
            F.col("o_totalprice").alias("max_price"),
        )
        for k in range(3):
            states = aggregate_states(
                raw.filter(F.col("orderkey") % 3 == k), ("custkey",), _AGG_SPEC
            )
            insert_into_parts(states, path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_aggregating_final",
    bench=False,
    tags=("S10", "A4", "mergetree", "aggregating-final"),
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_spend
    FROM orders
    GROUP BY o_custkey
    """,
)
def orders_parts_aggregating_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree FINAL: partial (count, decimal-sum, min, max)
    states written per part merge into exactly the GROUP BY over the raw
    rows — the incremental-materialized-view pattern where read cost is
    O(|customers| x |parts|) however many raw orders ever streamed in.
    The average is finished at read time from the merged (sum, count)
    pair — one IEEE division of two exact operands."""
    path = _aggregating_table(spark, sf_dir)
    fin = read_parts(spark, path, final=True)
    return fin.select(
        "custkey",
        "n_orders",
        F.col("total_spend").cast("double").alias("total_spend"),
        "min_price",
        "max_price",
        (F.col("total_spend").cast("double") / F.col("n_orders")).alias("avg_spend"),
    )


#: TTL = 1095 days; as-of = 2000-01-01T00:00:00Z. Orders are 1995-2001, so
#: the cut lands mid-corpus (survivors = ordered after 1996-12-31).
_TTL_SECONDS = 1095 * 86400.0
_TTL_AS_OF = 946684800.0


def _ttl_table(spark: SparkSession, sf_dir: str) -> str:
    """orders under a 3-year TTL on the order date, inserted as two parts,
    then OPTIMIZE'd at a fixed as-of so expiry is applied PHYSICALLY —
    the catalog row reads the post-merge table with no as_of filter."""
    key = (sf_dir, "ttl")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_ttl"
        create_parts_table(
            path, engine="append", ttl_col="born", ttl_seconds=_TTL_SECONDS
        )
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("price"),
            # NTZ timestamp -> tz-free date -> integer epoch seconds (order
            # dates are midnights, so days*86400 == DuckDB's epoch())
            (
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
                .cast("double")
                * 86400
            ).alias("born"),
        )
        for k in range(2):
            insert_into_parts(o.filter(F.col("orderkey") % 2 == k), path, batch_id=k)
        optimize_parts(spark, path, as_of=_TTL_AS_OF)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_ttl_expiry",
    bench=False,
    tags=("S10", "A1", "mergetree", "ttl"),
    oracle=f"""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE epoch(o_orderdate) + {_TTL_SECONDS} > {_TTL_AS_OF}
    GROUP BY o_orderpriority
    """,
)
def orders_parts_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-time TTL: rows older than 3 years at a FIXED as-of epoch are
    physically dropped by OPTIMIZE (the ClickHouse `TTL ... DELETE`
    posture), so a plain read — no as_of filter — already excludes them.
    The TTL column is numeric epoch seconds by contract, so no session-
    timezone cast can shift the expiry boundary between engines."""
    path = _ttl_table(spark, sf_dir)
    return (
        read_parts(spark, path)
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("price").cast("decimal(14,2)")).cast("double").alias("revenue"),
        )
    )


_PROJ_SPEC = {
    "by_prio_status": {
        "key_cols": ("priority", "status"),
        "agg_spec": {"n_orders": "sum", "revenue": "sum"},
    }
}


def _projected_table(spark: SparkSession, sf_dir: str) -> str:
    """orders as an append table carrying a (priority, status) projection,
    inserted as two parts so projection states must merge across parts."""
    key = (sf_dir, "projected")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_projected"
        create_parts_table(path, engine="append", projections=_PROJ_SPEC)
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
            F.lit(1).cast("long").alias("n_orders"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("revenue"),
        )
        for k in range(2):
            insert_into_parts(o.filter(F.col("orderkey") % 2 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_projection_rollup",
    bench=False,
    tags=("S10", "A1", "mergetree", "projection"),
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orders_parts_projection_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse projection answering a BI rollup: the routing helper
    picks the (priority, status) projection for a GROUP BY priority, and
    the read merges per-part pre-aggregated states re-keyed to the
    coarser grouping — cost ∝ projection state rows (|priority×status| ×
    parts), never the base orders. The oracle is the plain GROUP BY over
    the raw rows the projection must equal; decimal sum states keep the
    merge order-independent."""
    from ..sources.parts import read_projection, route_projection

    path = _projected_table(spark, sf_dir)
    name = route_projection(path, ("priority",), ("n_orders", "revenue"))
    assert name == "by_prio_status", name
    proj = read_projection(spark, path, name, group_cols=("priority",))
    return proj.select(
        "priority",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
    )


def _sampled_table(spark: SparkSession, sf_dir: str) -> str:
    """orders as an append table declaring SAMPLE BY custkey."""
    key = (sf_dir, "sampled")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_sampled"
        create_parts_table(path, engine="append", sample_col="custkey")
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("price"),
        )
        for k in range(2):
            insert_into_parts(o.filter(F.col("orderkey") % 2 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_sample_read",
    bench=False,
    tags=("S10", "A1", "mergetree", "sample-by"),
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
          < 1073741824
    GROUP BY o_orderpriority
    """,
)
def orders_parts_sample_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SAMPLE 1/4`` through the parts lifecycle: the sample
    key is TABLE metadata (SAMPLE BY custkey), the draw is the md5-bucket
    of the key — a pure function of the data, so the same quarter of
    customers is drawn on every run, every engine, and every part split;
    whole customers are in or out together. The oracle replays the exact
    bucket predicate (1073741824 = 2^32 / 4) over the raw rows."""
    path = _sampled_table(spark, sf_dir)
    df = read_parts(spark, path, sample_frac=0.25)
    return df.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("price").cast("decimal(14,2)")).cast("double").alias("revenue"),
    )


_HLL_SPEC = {"n_orders": "sum", "cust_sk": "hll"}


def _hll_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-priority distinct-customer sketches as an aggregating table —
    ClickHouse's uniqState materialized view: each insert batch lands
    (count, HLL state) rows; batches are sliced by ORDER key so every
    priority's states genuinely union across parts."""
    key = (sf_dir, "hll")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_hll"
        create_parts_table(
            path, engine="aggregating", key_cols=("priority",), agg_spec=_HLL_SPEC
        )
        raw = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("orderkey"),
            F.lit(1).cast("long").alias("n_orders"),
            F.col("o_custkey").alias("cust_sk"),
        )
        for k in range(3):
            states = aggregate_states(
                raw.filter(F.col("orderkey") % 3 == k), ("priority",), _HLL_SPEC
            )
            insert_into_parts(states, path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_hll_distinct",
    bench=False,
    tags=("S10", "A10", "mergetree", "aggregating-final", "sketch", "invariant"),
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS exact_cust,
           TRUE AS within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orders_parts_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqState/uniqMerge through the parts lifecycle: per-priority HLL
    sketches created per insert batch (hll_sketch_agg), merged at FINAL
    (hll_union_agg) — the mergeable-distinct MV that answers distinct
    questions in O(|keys| x |parts|) without ever re-scanning raw
    history. Sketch BYTES may legally differ across merge orders, so the
    oracled surface is the estimate's 5% accuracy flag plus the exact
    companions (the docs_percentiles_approx_invariant discipline)."""
    path = _hll_table(spark, sf_dir)
    fin = read_parts(spark, path, final=True).select(
        "priority",
        "n_orders",
        F.hll_sketch_estimate("cust_sk").alias("est"),
    )
    exact = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count_distinct("o_custkey").alias("exact_cust"))
    )
    return fin.join(exact, "priority").select(
        "priority",
        "n_orders",
        "exact_cust",
        (
            F.abs(F.col("est") - F.col("exact_cust"))
            <= 0.05 * F.col("exact_cust")
        ).alias("within_5pct"),
    )


def _mutated_table(spark: SparkSession, sf_dir: str) -> str:
    """The replacing layout of _replacing_table, then ONE mutation:
    customers divisible by 10 deleted (GDPR-style), finished orders'
    totals doubled — applied per part, sequences preserved."""
    key = (sf_dir, "mutated")
    if key not in _BUILT:
        from ..sources.parts import mutate_parts

        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_mutated"
        create_parts_table(
            path, engine="replacing", key_cols=("custkey",), version_col="orderkey"
        )
        orders = _orders_slim(spark, sf_dir)
        for k in range(3):
            insert_into_parts(orders.filter(F.col("orderkey") % 3 == k), path, batch_id=k)
        mutate_parts(
            spark,
            path,
            delete_where="custkey % 10 = 0",
            set_exprs={"totalprice": "totalprice * 2"},
            update_where="status = 'F'",
        )
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_mutation_rewrite",
    bench=False,
    tags=("S10", "mergetree", "mutation"),
    oracle="""
    SELECT custkey, orderkey, status,
           CASE WHEN status = 'F' THEN totalprice * 2
                ELSE totalprice END AS totalprice
    FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               o_orderstatus AS status, o_totalprice AS totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1 AND custkey % 10 <> 0
    """,
)
def orders_parts_mutation_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE DELETE + UPDATE through the parts lifecycle: the
    mutation rewrites each live part in place (sequence preserved, so
    the replacing window is untouched), deletes a customer slice and
    doubles finished orders' totals; FINAL afterwards equals the oracle's
    closed-form replay — window first, then the surviving winner's
    conditional doubling (doubling a double is exact)."""
    path = _mutated_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "custkey", "orderkey", "status", "totalprice"
    )


def _partitioned_table(spark: SparkSession, sf_dir: str) -> str:
    """orders as a STATUS-partitioned replacing table (the reference's
    ``PARTITION BY toYYYYMM`` + ReplacingMergeTree combination): three
    mod-3 insert batches, each part internally partitioned by status."""
    key = (sf_dir, "partitioned")
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix="kickhouse-parts-") + "/orders_partitioned"
        create_parts_table(
            path,
            engine="replacing",
            key_cols=("custkey",),
            version_col="orderkey",
            partition_col="status",
        )
        orders = _orders_slim(spark, sf_dir)
        for k in range(3):
            insert_into_parts(orders.filter(F.col("orderkey") % 3 == k), path, batch_id=k)
        _BUILT[key] = path
    return _BUILT[key]


@register(
    "orders_parts_partitioned_final",
    bench=False,
    tags=("S10", "W11", "mergetree", "partition-final"),
    oracle="""
    SELECT status, custkey, orderkey, totalprice
    FROM (
        SELECT o_orderstatus AS status, o_custkey AS custkey,
               o_orderkey AS orderkey, o_totalprice AS totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderstatus, o_custkey
                   ORDER BY o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def orders_parts_partitioned_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition FINAL on a physically partitioned table — the
    reference's PARTITION BY + ReplacingMergeTree shape: data in
    different partitions never merges, so a customer active under two
    statuses keeps one latest row PER STATUS; a status filter prunes the
    scan below the collapse (plan-guarded in tests/test_plan_shapes —
    FINAL over one partition reads one partition)."""
    path = _partitioned_table(spark, sf_dir)
    return read_parts(spark, path, final=True).select(
        "status", "custkey", "orderkey", "totalprice"
    )
