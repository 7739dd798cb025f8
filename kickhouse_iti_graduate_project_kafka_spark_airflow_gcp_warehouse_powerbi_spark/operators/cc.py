"""Connected components over dup-pair edges — dedup *clustering* at scale.

Near-dup pair generation (operators/dedup.py) yields edges; turning edges
into keep/drop decisions needs the transitive closure: if A~B and B~C, all
three are one cluster and one representative survives. This module computes
components with the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public literature), which converges in O(log n) rounds *independent of graph
diameter* — the property that matters at 100 TB, where min-label
propagation's O(diameter) rounds lose badly on dup chains.

Every round is two hash-aggregates + two joins on node ids — no
``collect_set`` adjacency lists (a hot node with millions of neighbors would
OOM a task), no driver-side graph. Lineage is truncated each round with
``localCheckpoint`` (an iterative plan otherwise grows exponentially and
analysis time dominates); at cluster scale, point ``spark.sparkContext.
setCheckpointDir`` at durable storage and swap in ``checkpoint``.

Convergence is detected with a two-scalar fingerprint of the canonical edge
set ``(count, xor-ish sum of xxhash64(u,v))`` — one tiny action per round,
never a full subtract/except of edge sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both directions of each edge, self-loops dropped: columns (u, v)."""
    e = edges.select(F.col("u").cast("long"), F.col("v").cast("long")).filter(
        F.col("u") != F.col("v")
    )
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every *strictly larger* neighbor of u to min(N(u) ∪ {u}).

    Emitted edge set: {(v, m(u)) : (u,v) ∈ sym, v > u}. Each undirected edge
    contributes from exactly one endpoint's perspective, so the output size
    is bounded by the input size.
    """
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("_m"))
    )
    # No distinct here: each input edge emits at most one output edge, so
    # volume stays bounded, and the round's canonical form (which the
    # convergence fingerprint needs) comes from _small_star's distinct —
    # min-aggregations are duplicate-insensitive, so correctness is
    # unaffected and the round saves one full shuffle.
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Connect every *smaller-or-equal* neighbor (and u itself) to the min
    of that neighborhood. Output edges point (node, candidate-root)."""
    smaller = sym.filter(F.col("v") < F.col("u"))
    mins = smaller.groupBy("u").agg(F.min("v").alias("_m"))
    rewired = (
        smaller.join(mins, "u")
        .filter(F.col("v") != F.col("_m"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    self_edges = mins.select("u", F.col("_m").alias("v"))
    return rewired.union(self_edges).distinct()


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, sum of xxhash64(u,v)) — a cheap canonical-set fingerprint.

    The sum is taken in DecimalType (sums of 64-bit hashes overflow a long
    and ANSI mode traps) — one scalar row back to the driver.
    """
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"] or 0)


def _release_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``'d frame.

    Spark reclaims local-checkpoint blocks only when the driver JVM GC
    collects the RDD (ContextCleaner weak-ref path); inside an iterative
    loop on a large heap that can be never — the r12 sf100 ladder filled
    the local disk with superseded per-round checkpoints this way. The
    checkpointed Dataset's analyzed plan is a ``LogicalRDD`` wrapping the
    persisted internal RDD; unpersisting that RDD drops its blocks
    immediately. Best-effort: callers only pass frames that will never be
    read again (lineage is truncated, so a released frame is unusable),
    and any plan-shape surprise falls back to the GC path rather than
    failing the job.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover - plan-shape fallback
        pass


def _driver_union_find(spark, cur: DataFrame, id_col: str) -> DataFrame:
    """Finish a small edge set on the driver: union-find with the larger
    root attached under the smaller, so every final root is its
    component's minimum id — byte-identical labels to the distributed
    star-forest extraction. Arrow transfer (two int64 columns), pure-dict
    union-find, Arrow back."""
    import pandas as pd

    pdf = cur.toPandas()
    if pdf.empty:
        return spark.createDataFrame([], f"{id_col} long, component long")
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
        else:
            parent.setdefault(ru, ru)
    node_ids = set(map(int, pdf["u"].to_numpy())) | set(map(int, pdf["v"].to_numpy()))
    out = pd.DataFrame(
        {
            id_col: pd.Series(sorted(node_ids), dtype="int64"),
        }
    )
    out["component"] = [find(n) for n in out[id_col]]
    out["component"] = out["component"].astype("int64")
    return spark.createDataFrame(out)


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
    assume_distinct: bool = False,
    driver_finish_edges: int = 1_000_000,
) -> DataFrame:
    """Component labels for an undirected graph given as an edge list.

    Returns (id, component) where ``component`` is the minimum node id in
    the component — deterministic, so downstream keep-one-per-cluster
    decisions are reproducible. ``nodes`` (optional, one ``id_col`` column)
    adds isolated nodes, which label themselves.

    Scale posture: each round shuffles edge rows on 8-byte node ids (two
    aggregates + two joins), output never exceeds input row count, and the
    round count is O(log n). A supernode (one doc near-duping millions) is
    a *group* with many rows, handled by map-side partial min — never an
    in-memory neighbor array.

    ``assume_distinct=True`` skips the initial edge dedup (one full
    shuffle of the edge set) — pass it when the producer guarantees
    unique edges, e.g. pair generators ending in a groupBy on
    (src, dst). Duplicate edges would not break correctness anyway
    (min-aggregations are duplicate-insensitive); the dedup only bounds
    per-round volume, which a unique-by-construction input already does.

    ``driver_finish_edges``: once the (current) edge set is at or under
    this many rows, the remaining closure is finished on the driver with
    union-find instead of more distributed rounds — a BOUNDED driver read
    (two int64 columns over Arrow, ≤16 MB raw at the default cap),
    the same posture as the loop's per-round scalar fingerprint. Rounds
    preserve components and node coverage (Kiveris et al. invariant), so
    finishing early is result-identical; labels stay min-id deterministic
    because union always attaches the larger root under the smaller. At
    100 TB the first rounds run distributed until the surviving edge set
    fits the cap; a dup-pair graph whose edges already fit goes straight
    to the driver — near-dup pair sets are tiny next to the corpus.
    Set 0 to force the fully distributed path.
    """
    spark = edges.sparkSession
    cur = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    if not assume_distinct:
        cur = cur.distinct()
    # eager=False everywhere in the loop: the round's ONE action (the
    # convergence fingerprint) both materializes the checkpoint and reads
    # the two scalars — one job per round instead of two. Lineage is still
    # truncated at every round boundary once that action runs.
    cur = cur.localCheckpoint(eager=False)
    finished_on_driver = False
    if driver_finish_edges and cur.count() <= driver_finish_edges:
        out = _driver_union_find(spark, cur, id_col)
        finished_on_driver = True
        _release_checkpoint(cur)
    # partition sizing per round is AQE's job: every round ends in
    # _small_star's distinct (a shuffle), and adaptive coalescing
    # right-sizes its output as edge sets shrink — an explicit repartition
    # here would be a second full shuffle doing the same work
    #
    # No fingerprint of the INPUT: comparing round k to k-1 starts paying
    # off after round 1, and an input that is already a star forest still
    # converges in one extra (cheap) round — the init fingerprint job was
    # pure overhead on every real call.
    if not finished_on_driver:
        prev_fp: tuple[int, int] | None = None
        converged = False
        for _ in range(max_iter):
            prev = cur
            cur = _small_star(_large_star(_symmetric(cur))).localCheckpoint(
                eager=False
            )
            fp = _edge_fingerprint(cur)
            # the fingerprint action materialized the new checkpoint, so
            # the previous round's blocks are dead — drop them now instead
            # of waiting for a driver GC that a big heap may never run
            # (disk-fill failure mode, r12 sf100 ladder)
            _release_checkpoint(prev)
            if fp == prev_fp:
                converged = True
                break
            prev_fp = fp
            if driver_finish_edges and fp[0] <= driver_finish_edges:
                # surviving edge set fits the bounded driver read — finish
                # the closure with union-find instead of more rounds
                out = _driver_union_find(spark, cur, id_col)
                finished_on_driver = True
                _release_checkpoint(cur)
                break
        if not converged and not finished_on_driver:
            # Treating an unconverged edge set as a star forest would return
            # silently wrong labels, and downstream keep/drop dedup decisions
            # depend on them — fail loudly instead. Kiveris et al. prove
            # convergence in O(log² n) rounds; hitting this with max_iter=25
            # means a graph far outside the design envelope (or a bug).
            raise RuntimeError(
                f"connected_components did not converge within {max_iter} "
                f"alternating large-star/small-star rounds "
                f"(last fingerprint {prev_fp}); raise max_iter"
            )
    if not finished_on_driver:
        # post-convergence the edge set is a star forest: (member, root)
        labels = cur.select(F.col("u").alias(id_col), F.col("v").alias("component"))
        roots = cur.select(F.col("v").alias(id_col)).distinct().withColumn(
            "component", F.col(id_col)
        )
        out = labels.union(roots)
    if nodes is not None:
        isolated = (
            nodes.select(F.col(id_col).cast("long"))
            .join(out.select(id_col), id_col, "left_anti")
            .withColumn("component", F.col(id_col))
        )
        out = out.union(isolated)
    return out.distinct()


def cluster_sizes(components: DataFrame) -> DataFrame:
    """(component, cluster_size) — the dedup-cluster histogram input."""
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
