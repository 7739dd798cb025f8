"""Connected-components (large-star/small-star) vs a driver-side union-find
oracle on adversarial graph shapes."""

import random

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.cc import (
    cluster_sizes,
    connected_components,
)


def _uf(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def _run(spark, n, edges, driver_finish_edges=1_000_000):
    edf = spark.createDataFrame(edges or [(0, 0)], "a_id long, b_id long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            edf, nodes=ndf, driver_finish_edges=driver_finish_edges
        ).collect()
    }
    assert got == _uf(n, edges)
    return got


import pytest

# 1_000_000 -> bounded driver union-find finish (the small-graph path);
# 0 -> fully distributed large-star/small-star rounds. Labels must be
# identical (min node id per component) on both.
_PATHS = [1_000_000, 0]


@pytest.mark.parametrize("cap", _PATHS)
def test_random_graph(spark, cap):
    random.seed(11)
    edges = [(random.randrange(120), random.randrange(120)) for _ in range(90)]
    _run(spark, 120, edges, driver_finish_edges=cap)


@pytest.mark.parametrize("cap", _PATHS)
def test_long_chain_converges_in_log_rounds(spark, cap):
    # diameter 199: min-label propagation would need ~200 rounds; the
    # star algorithm must finish well inside max_iter=25
    edges = [(i, i + 1) for i in range(199)]
    got = _run(spark, 200, edges, driver_finish_edges=cap)
    assert set(got.values()) == {0}


@pytest.mark.parametrize("cap", _PATHS)
def test_no_edges_all_isolated(spark, cap):
    got = _run(spark, 30, [], driver_finish_edges=cap)
    assert got == {i: i for i in range(30)}


def test_mid_loop_driver_handoff(spark):
    # cap between the initial edge count and 0: distributed rounds run
    # until the shrinking edge set fits, then union-find finishes — the
    # 100 TB shape (rounds first, bounded driver read last)
    edges = [(i, i + 1) for i in range(199)]
    got = _run(spark, 200, edges, driver_finish_edges=150)
    assert set(got.values()) == {0}


def test_rounds_release_superseded_checkpoints(spark):
    # Each distributed round localCheckpoints the shrinking edge set; the
    # superseded rounds' blocks must be unpersisted DETERMINISTICALLY, not
    # left for a driver GC that a big heap may never run (the r12 sf100
    # ladder filled local disk with dead round checkpoints). After a fully
    # distributed run, at most the FINAL star forest may remain pinned.
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    edges = [(i, i + 1) for i in range(199)]  # ~8 rounds at diameter 199
    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    out = connected_components(edf, driver_finish_edges=0)
    out.collect()
    assert jsc.getPersistentRDDs().size() - base <= 1
    # driver-finish path releases even the final checkpoint (output is
    # driver-built, never reads it again)
    out2 = connected_components(edf, driver_finish_edges=1_000_000)
    out2.collect()
    assert jsc.getPersistentRDDs().size() - base <= 1


def test_cluster_sizes_sum_to_node_count(spark):
    random.seed(3)
    edges = [(random.randrange(60), random.randrange(60)) for _ in range(40)]
    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    ndf = spark.createDataFrame([(i,) for i in range(60)], "id long")
    comps = connected_components(edf, nodes=ndf)
    sizes = {r["component"]: r["cluster_size"] for r in cluster_sizes(comps).collect()}
    assert sum(sizes.values()) == 60
    # every representative labels itself
    assert all(comp in sizes for comp in sizes)
