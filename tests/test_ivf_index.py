"""Persisted IVF index: layout, result-equivalence with the in-memory
operator, and cell-directory pruning at query time."""

import os

import pytest

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_from_index,
    load_centroids,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)

N_CELLS = 8


@pytest.fixture(scope="module")
def ivf_index(spark, sf_oracle, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = load_table(spark, sf_oracle, "embeddings")
    centroids = build_ivf_index(emb, path, n_cells=N_CELLS, iters=2)
    return path, emb, centroids


def test_index_roundtrip_matches_inmemory(spark, ivf_index):
    path, emb, centroids = ivf_index
    queries = emb.filter(F.col("vec_id") < 5)

    # layout: one directory per cell, centroids table round-trips exactly
    dirs = [d for d in os.listdir(f"{path}/vectors") if d.startswith("cell=")]
    assert 1 < len(dirs) <= N_CELLS
    loaded = load_centroids(spark, path)
    assert len(loaded) == N_CELLS
    assert all((a == b).all() for a, b in zip(centroids, loaded))

    got = sorted(
        tuple(r)
        for r in ivf_topk_from_index(spark, path, queries, k=5, nprobe=2).collect()
    )
    exp = sorted(
        tuple(r) for r in ivf_topk(emb, queries, centroids, k=5, nprobe=2).collect()
    )
    assert got == exp and len(got) > 0


def test_index_scan_prunes_cells(spark, ivf_index):
    path, emb, _ = ivf_index
    vectors = spark.read.parquet(f"{path}/vectors")

    # static pruning: a literal cell filter must reach PartitionFilters
    one_cell = vectors.filter(F.col("cell") == 3)
    plan = one_cell._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "cell" in plan
    assert one_cell.count() > 0

    # query path against the persisted layout stays correct with nprobe=1
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk_from_index(spark, path, queries, k=3, nprobe=1)
    assert out.count() > 0
