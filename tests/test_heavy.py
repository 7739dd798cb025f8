"""Heavy-hitters operator (operators/heavy.py): exactness vs plain
GROUP BY, sketch mergeability, candidate pruning, and the skew gate."""

import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
    cm_sketch,
    estimated_top_share,
    heavy_hitters,
    should_salt,
)


def _skewed(spark, n=5000):
    """user 0 owns ~half the rows; the rest spread over 500 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(500)) + 1)
        .alias("k"),
        (F.col("id") % 7).alias("grp"),
    )


def _sortable(rows):
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def _exact(df, key_cols, t):
    return _sortable(
        tuple(r)
        for r in df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= t)
        .collect()
    )


@pytest.mark.parametrize("t", [1, 10, 100, 2000, 10**6])
def test_exact_vs_groupby_all_thresholds(spark, t):
    df = _skewed(spark)
    got = sorted(tuple(r) for r in heavy_hitters(df, ["k"], t).collect())
    assert got == _exact(df, ["k"], t)


def test_composite_key_and_nulls(spark):
    df = spark.range(300).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") % 4).alias("a"),
        (F.col("id") % 2).alias("b"),
    )
    got = _sortable(
        tuple(r) for r in heavy_hitters(df, ["a", "b"], 30).collect()
    )
    assert got == _exact(df, ["a", "b"], 30)
    # NULL keys form their own group on both sides
    assert any(a is None for a, _, _ in got)


def test_tiny_width_still_exact(spark):
    """Width 4 makes almost every bucket heavy — the candidate filter
    degrades to a no-op but the exact verify keeps the answer right."""
    df = _skewed(spark, n=2000)
    got = sorted(
        tuple(r) for r in heavy_hitters(df, ["k"], 50, width=4).collect()
    )
    assert got == _exact(df, ["k"], 50)


def test_empty_and_validation(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert heavy_hitters(df, ["k"], 5).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(df, ["k"], 0)


def test_candidate_filter_prunes_shuffle_rows(spark):
    """The point of the sketch: non-candidate keys never reach the by-key
    groupBy. With a hot key at ~50% and threshold just below its count,
    the exact pass must group far fewer rows than the input."""
    df = _skewed(spark, n=4000).persist()
    try:
        hot = df.filter(F.col("k") == 0).count()
        out = heavy_hitters(df, ["k"], hot, width=8192)
        assert [tuple(r) for r in out.collect()] == [(0, hot)]
        # reproduce the candidate leg exactly as heavy_hitters builds it
        # and check the pruning itself
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
            DEFAULT_DEPTH,
            _bucket_col,
        )

        sketch = cm_sketch(df, ["k"])
        heavy = sketch.filter(F.col("cnt") >= hot)
        cand = df
        for i in range(DEFAULT_DEPTH):
            hb = heavy.filter(F.col("i") == i).select(
                F.col("bucket").alias(f"_hb{i}")
            )
            cand = cand.withColumn(f"_b{i}", _bucket_col(["k"], i, 8192, 0)).join(
                F.broadcast(hb), F.col(f"_b{i}") == F.col(f"_hb{i}"), "left_semi"
            )
        n_cand = cand.count()
        assert n_cand < df.count() * 0.8  # real pruning happened
        assert n_cand >= hot  # no false negatives
    finally:
        df.unpersist()


def test_sketch_mergeable(spark):
    """Union + sum of two partial sketches == sketch of the union — the
    property an incremental rollup relies on."""
    a = spark.range(0, 1500).select((F.col("id") % 97).alias("k"))
    b = spark.range(1500, 4000).select((F.col("id") % 97).alias("k"))
    merged = (
        cm_sketch(a, ["k"])
        .unionByName(cm_sketch(b, ["k"]))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cm_sketch(a.unionByName(b), ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_top_share_is_upper_bound_and_gates(spark):
    skew = _skewed(spark)
    uniform = spark.range(5000).select(F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k"))
    n = skew.count()
    true_share = skew.filter(F.col("k") == 0).count() / n
    est = estimated_top_share(skew, ["k"])
    assert est >= true_share - 1e-12  # never under-estimates
    assert est < true_share + 0.05  # and is tight at this width
    assert should_salt(skew, ["k"], share_threshold=0.05)
    assert not should_salt(uniform, ["k"], share_threshold=0.05)
    assert estimated_top_share(spark.range(0).select(F.col("id").alias("k")), ["k"]) == 0.0


def test_broadcast_semi_joins_in_plan(spark):
    """The candidate filter must be broadcast semi joins (the heavy-bucket
    side is sketch-bounded) — a shuffled build side would defeat it."""
    df = _skewed(spark)
    plan = heavy_hitters(df, ["k"], 100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_shared_sketch_equivalence_and_validation(spark):
    """One materialized KeyFreqSketch feeds heavy_hitters, the top-share
    bound AND should_salt with results identical to the per-call sketch
    path; mismatched keys are refused (a wrong-keyed sketch would
    silently mis-filter)."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
        build_key_sketch,
    )

    df = _skewed(spark)
    sk = build_key_sketch(df, ["k"])
    try:
        assert sk.df.storageLevel.useMemory  # materialized once
        direct_hh = _sortable(
            tuple(r) for r in heavy_hitters(df, ["k"], 100).collect()
        )
        shared_hh = _sortable(
            tuple(r) for r in heavy_hitters(df, ["k"], 100, sketch=sk).collect()
        )
        assert shared_hh == direct_hh == _exact(df, ["k"], 100)
        assert estimated_top_share(df, ["k"], sketch=sk) == estimated_top_share(
            df, ["k"]
        )
        assert should_salt(df, ["k"], sketch=sk) is should_salt(df, ["k"]) is True
        with pytest.raises(ValueError, match="built over keys"):
            heavy_hitters(df, ["grp"], 10, sketch=sk)
    finally:
        sk.df.unpersist()


def test_asof_auto_accepts_shared_sketch(spark):
    """asof_join_auto with a shared right-side sketch returns the same
    rows as the probe-per-call path (the gate is purely physical)."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.asof import (
        asof_join_auto,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
        build_key_sketch,
    )

    left = spark.createDataFrame(
        [(0, 100), (0, 250), (7, 100)], "k long, sec long"
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    # right side skewed onto k=0 so the gate picks the bucketed variant
    right = spark.range(400).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 7)
        .alias("k"),
        F.timestamp_seconds(F.col("id") * 3).alias("ts"),
        F.col("id").alias("v"),
    )
    sk = build_key_sketch(right, ["k"])
    try:
        base = _sortable(
            tuple(r)
            for r in asof_join_auto(
                left, right, ["k"], "ts", "ts", bucket_micros=100
            ).collect()
        )
        shared = _sortable(
            tuple(r)
            for r in asof_join_auto(
                left, right, ["k"], "ts", "ts", bucket_micros=100, sketch=sk
            ).collect()
        )
        assert shared == base and base
    finally:
        sk.df.unpersist()
