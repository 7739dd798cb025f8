"""Property-based tests (hypothesis) for the round-2 operators: connected
components vs union-find on arbitrary graphs, shard assignment vs a
sequential scan on arbitrary weights, int8 quantization error bounds on
arbitrary vectors."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.cc import (
    connected_components,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
    token_balanced_shards,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _uf(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@SLOW
@given(
    st.integers(min_value=2, max_value=40).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1), st.integers(0, n - 1)
                ),
                max_size=60,
            ),
        )
    )
)
def test_cc_equals_union_find(spark, graph):
    n, edges = graph
    edf = spark.createDataFrame(edges or [(0, 0)], "a_id long, b_id long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == _uf(n, edges)


@SLOW
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=120),
    st.integers(min_value=10, max_value=1000),
)
def test_shards_equal_sequential_scan(spark, weights, target):
    rows = [(i * 2, w) for i, w in enumerate(weights)]  # ids with gaps
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in token_balanced_shards(df, "n_tok", "doc_id", target, bucket_width=16).collect()
    }
    prefix = 0
    for doc_id, w in rows:
        assert got[doc_id] == prefix // target
        prefix += w


@SLOW
@given(
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False,
            width=32,
        ),
        min_size=2,
        max_size=32,
    )
)
def test_quantization_error_within_half_grid(spark, vec):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.vectors import (
        dequantize_int8,
        quantize_int8,
    )

    df = spark.createDataFrame([(vec,)], "e array<float>")
    lo, hi = F.array_min("e").cast("double"), F.array_max("e").cast("double")
    deq = dequantize_int8(quantize_int8("e"), lo, hi)
    row = df.select(
        F.array_max(
            F.zip_with(F.col("e"), deq, lambda x, y: F.abs(x.cast("double") - y))
        ).alias("err"),
        (hi - lo).alias("range"),
        quantize_int8("e").alias("q"),
    ).collect()[0]
    # error bounded by half the grid step (+ float slack)
    assert row["err"] <= row["range"] / 510.0 + 1e-9
    assert all(-128 <= q <= 127 for q in row["q"])


@SLOW
@given(
    weights=st.lists(st.integers(0, 300), min_size=1, max_size=60),
    seq_len=st.integers(min_value=1, max_value=64),
)
def test_pack_sequences_equals_sequential_packer(spark, weights, seq_len):
    """Arbitrary weights (zeros included) and sequence lengths: the
    distributed layout must equal a sequential packer walking docs in
    order and cutting at every seq_len boundary."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.shards import (
        pack_sequences,
    )

    rows = [(i * 2 + 1, w) for i, w in enumerate(weights)]  # gappy ids
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        (r["doc_id"], r["seq_id"]): (r["begin_tok"], r["end_tok"])
        for r in pack_sequences(df, "n_tok", "doc_id", seq_len, bucket_width=7).collect()
    }
    expect = {}
    prefix = 0
    for doc_id, w in rows:
        if w > 0:
            for seq in range(prefix // seq_len, (prefix + w - 1) // seq_len + 1):
                b = max(seq * seq_len, prefix) - prefix
                e = min((seq + 1) * seq_len, prefix + w) - prefix
                expect[(doc_id, seq)] = (b, e)
        prefix += w
    assert got == expect
