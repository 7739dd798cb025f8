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


def _run(spark, n, edges):
    edf = spark.createDataFrame(edges or [(0, 0)], "a_id long, b_id long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == _uf(n, edges)
    return got


def test_random_graph(spark):
    random.seed(11)
    edges = [(random.randrange(120), random.randrange(120)) for _ in range(90)]
    _run(spark, 120, edges)


def test_long_chain_converges_in_log_rounds(spark):
    # diameter 199: min-label propagation would need ~200 rounds; the
    # star algorithm must finish well inside max_iter=25
    edges = [(i, i + 1) for i in range(199)]
    got = _run(spark, 200, edges)
    assert set(got.values()) == {0}


def test_no_edges_all_isolated(spark):
    got = _run(spark, 30, [])
    assert got == {i: i for i in range(30)}


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
