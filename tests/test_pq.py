"""Product quantization (operators/pq.py): codebook determinism, code
layout, the full-rerank == brute-force invariant, recall bounds, ADC
approximation quality, and the persisted-index round trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
    build_pq_index,
    load_pq_index,
    pq_adc_topk,
    pq_encode,
    pq_search_rerank,
    pq_train,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.similarity import (
    brute_force_topk,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def emb(spark, sf_oracle):
    df = load_table(spark, sf_oracle, "embeddings").persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=16, ks=64, iters=4)


def test_train_shape_and_determinism(emb, books):
    assert books.shape == (16, 64, 4)  # dim 64 / m 16
    again = pq_train(emb, m=16, ks=64, iters=4)
    assert np.array_equal(books, again)


def test_train_validation(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7)
    with pytest.raises(ValueError, match="256"):
        pq_train(emb, ks=512)
    with pytest.raises(ValueError, match="fewer"):
        pq_train(emb.limit(3), m=8, ks=16)


def test_encode_layout(emb, books):
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        blob = bytes(r["code"])
        assert len(blob) == 16  # m bytes per vector: 16x smaller than raw
        assert max(blob) < 64  # ks bound
    # deterministic re-encode
    assert sorted((r["n_id"], bytes(r["code"])) for r in rows) == sorted(
        (r["n_id"], bytes(r["code"])) for r in pq_encode(emb, books).collect()
    )


def test_full_rerank_equals_bruteforce(emb, books):
    """rerank >= corpus size makes the shortlist total — the exact tier
    then must reproduce brute force bit-for-bit (pairs AND ranks)."""
    q = emb.filter(F.col("vec_id") < 5)
    full = pq_search_rerank(emb, q, books, k=5, rerank=10**6).select(
        "q_id", "n_id", "rank"
    )
    brute = brute_force_topk(emb, q, k=5).select("q_id", "n_id", "rank")
    assert full.exceptAll(brute).count() == 0
    assert brute.exceptAll(full).count() == 0


def test_rerank_recall_bound(emb, books):
    """The two-stage search at a practical shortlist (rerank=50 of 500)
    must keep recall@10 high — measured 0.98 on this fixture; 0.85 is the
    regression floor."""
    q = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(emb, q, k=10)
    rr = pq_search_rerank(emb, q, books, k=10, rerank=50)
    nb = brute.count()
    hits = rr.join(brute, ["q_id", "n_id"], "inner").count()
    assert hits / nb >= 0.85


def test_adc_scores_approximate_true_cosine(emb, books):
    """ADC similarity comes from the reconstruction; it must track the
    exact cosine of the same pair closely (else the shortlist is noise)."""
    q = emb.filter(F.col("vec_id") < 5)
    codes = pq_encode(emb, books)
    adc = pq_adc_topk(codes, q, books, k=20)
    brute = brute_force_topk(emb, q, k=499)  # all pairs, exact cos
    joined = adc.join(
        brute.select("q_id", "n_id", "cos"), ["q_id", "n_id"], "inner"
    ).select(F.abs(F.col("adc_cos") - F.col("cos")).alias("err"))
    stats = joined.agg(
        F.avg("err").alias("mean"), F.max("err").alias("mx")
    ).first()
    assert stats["mean"] < 0.05
    assert stats["mx"] < 0.25


def test_index_roundtrip(emb, books, tmp_path, spark):
    path = str(tmp_path / "pqidx")
    built = build_pq_index(emb, path, m=16, ks=64, iters=4)
    codes, loaded = load_pq_index(spark, path)
    assert np.array_equal(built, books)
    assert np.array_equal(loaded, books)
    # search over persisted codes == search with on-the-fly encoding
    q = emb.filter(F.col("vec_id") < 3)
    a = pq_search_rerank(emb, q, books, k=5, rerank=50, codes=codes).select(
        "q_id", "n_id", "rank"
    )
    b = pq_search_rerank(emb, q, books, k=5, rerank=50).select(
        "q_id", "n_id", "rank"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_null_and_self_excluded(spark, books):
    """NULL vectors never enter the code table; a query never returns
    itself."""
    rows = [(0, [1.0] * 64), (1, None), (2, [1.0] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = pq_encode(df, books)
    assert codes.count() == 2
    out = pq_search_rerank(
        df.filter(F.col("embedding").isNotNull()),
        df.filter(F.col("vec_id") == 0),
        books,
        k=5,
        rerank=10,
        codes=codes,
    )
    got = out.select("q_id", "n_id").collect()
    assert all(r["n_id"] != 0 for r in got) and len(got) == 1


@pytest.fixture(scope="module")
def cents(emb):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
        kmeans_centroids,
    )

    return kmeans_centroids(emb, n_cells=8, iters=2)


def test_ivfpq_full_probe_full_rerank_equals_bruteforce(emb, books, cents):
    """nprobe = n_cells and rerank >= N: both prune stages are total, so
    IVF-PQ must reproduce brute force exactly."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        ivfpq_topk,
    )

    q = emb.filter(F.col("vec_id") < 5)
    got = ivfpq_topk(
        emb, q, cents, books, k=5, nprobe=8, rerank=10**6
    ).select("q_id", "n_id", "rank")
    brute = brute_force_topk(emb, q, k=5).select("q_id", "n_id", "rank")
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


def test_ivfpq_practical_recall(emb, books, cents):
    """nprobe=4 of 8 cells, rerank=50: the recall floor for the composed
    layout (each stage loses a little; the product must stay useful)."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        ivfpq_topk,
    )

    q = emb.filter(F.col("vec_id") < 10)
    got = ivfpq_topk(emb, q, cents, books, k=10, nprobe=4, rerank=50)
    brute = brute_force_topk(emb, q, k=10)
    nb = brute.count()
    hits = got.join(brute, ["q_id", "n_id"], "inner").count()
    assert hits / nb >= 0.6


def test_ivfpq_index_roundtrip(emb, tmp_path, spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
    )

    path = str(tmp_path / "ivfpq")
    cents_b, books_b = build_ivfpq_index(
        emb, path, n_cells=8, cell_iters=2, m=16, ks=64, pq_iters=4
    )
    codes, cents_l, books_l = load_ivfpq_index(spark, path)
    assert np.array_equal(books_b, books_l)
    assert all(np.array_equal(a, b) for a, b in zip(cents_b, cents_l))
    assert "cell" in codes.columns
    q = emb.filter(F.col("vec_id") < 3)
    a = ivfpq_topk(
        emb, q, cents_l, books_l, k=5, nprobe=8, rerank=100, codes=codes
    ).select("q_id", "n_id", "rank")
    b = ivfpq_topk(
        emb, q, cents_b, books_b, k=5, nprobe=8, rerank=100
    ).select("q_id", "n_id", "rank")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # probe pruning is physical: the codes scan carries a cell partition
    # filter when probes are restricted
    import glob

    assert len(glob.glob(f"{path}/codes/cell=*")) == 8


def test_ivfpq_null_query_dropped(spark, emb, books, cents):
    """A NULL-vector query produces probe rows but no LUT — the ADC
    kernel must drop its rows, not misindex another query's table."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        ivfpq_topk,
    )

    q = emb.filter(F.col("vec_id") < 3).unionByName(
        spark.createDataFrame(
            [(10**6, None, 0)], "vec_id long, embedding array<float>, label int"
        )
    )
    out = ivfpq_topk(emb, q, cents, books, k=3, nprobe=8, rerank=20).collect()
    assert all(r["q_id"] != 10**6 for r in out)
    assert {r["q_id"] for r in out} == {0, 1, 2}


def test_ivfpq_append_and_replay_converge(spark, emb, tmp_path):
    """IVF-PQ incremental append: fixed quantizers encode the batch, new
    codes land in their cells, replays are no-ops, and search over the
    appended index equals on-the-fly encoding of the full corpus with the
    SAME centroids + codebooks."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
    )

    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivfpq_inc")
    build_ivfpq_index(base, path, n_cells=8, cell_iters=2, m=16, ks=64, pq_iters=4)
    n_base = spark.read.parquet(f"{path}/codes").count()

    s = append_to_ivfpq_index(spark, path, batch)
    assert s["n_appended"] == s["n_batch"] and s["n_replayed"] == 0
    assert spark.read.parquet(f"{path}/codes").count() == n_base + s["n_batch"]

    s2 = append_to_ivfpq_index(spark, path, batch)
    assert s2 == {"n_batch": s["n_batch"], "n_appended": 0,
                  "n_replayed": s["n_batch"]}
    assert spark.read.parquet(f"{path}/codes").count() == n_base + s["n_batch"]

    codes, cents, books = load_ivfpq_index(spark, path)
    q = emb.filter(F.col("vec_id") < 3)
    a = ivfpq_topk(
        emb, q, cents, books, k=5, nprobe=8, rerank=100, codes=codes
    ).select("q_id", "n_id", "rank")
    b = ivfpq_topk(
        emb, q, cents, books, k=5, nprobe=8, rerank=100
    ).select("q_id", "n_id", "rank")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ivfpq_append_duplicate_ids_collapse(spark, emb, tmp_path):
    """Ids doubled WITHIN a batch collapse before the write; a replayed
    id never lands twice even across calls."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )

    base = emb.filter(F.col("vec_id") >= 100)
    path = str(tmp_path / "ivfpq_dup")
    build_ivfpq_index(base, path, n_cells=8, cell_iters=2, m=16, ks=64, pq_iters=4)
    small = emb.filter(F.col("vec_id") < 10)
    doubled = small.unionAll(small)
    s = append_to_ivfpq_index(spark, path, doubled)
    assert s["n_batch"] == 10 and s["n_appended"] == 10
    stored = spark.read.parquet(f"{path}/codes").filter(F.col("n_id") < 10)
    assert stored.count() == 10
    assert stored.select("n_id").distinct().count() == 10


def test_pq_reconstruction_error_drift(spark, emb, books):
    """In-distribution batches sit near the training error; an
    out-of-distribution batch (vectors far outside the corpus range)
    reports a much larger reconstruction error — the rebuild signal."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        pq_reconstruction_error,
    )

    base = pq_reconstruction_error(emb, books)
    assert base["n"] == emb.count()
    assert base["mean_sq_err"] >= 0.0
    assert base["p95_sq_err"] >= base["mean_sq_err"] * 0.1

    dim = len(emb.first()["embedding"])
    far = spark.createDataFrame(
        [(i, [100.0 + i % 7] * dim) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    drifted = pq_reconstruction_error(far, books)
    assert drifted["n"] == 50
    assert drifted["mean_sq_err"] > base["mean_sq_err"] * 10
