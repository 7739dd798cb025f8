"""Streaming per-day HLL sketch maintenance: batch-twin equality, replay
idempotence, estimate accuracy."""

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.hll_stream import (
    daily_estimates,
    maintain_hll_stream,
    upsert_hll_batch,
)


def test_upsert_matches_batch_and_is_replay_idempotent(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("ts", "user_id")
    half1 = ev.filter(F.col("user_id") % 2 == 0)
    half2 = ev.filter(F.col("user_id") % 2 == 1)
    path = str(tmp_path / "sk")

    s1 = upsert_hll_batch(spark, half1, path)
    assert s1["n_batch_rows"] == half1.count()
    s2 = upsert_hll_batch(spark, half2, path)
    assert s2["n_days_total"] >= s1["n_days_total"]

    # batch twin: incrementally-merged registers == one-shot batch sketch
    # (HLL union is associative/commutative), so the estimates are EQUAL,
    # not merely close
    batch_daily = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
    )
    got = {
        r["day"]: r["est"]
        for r in daily_estimates(spark, path).filter(F.col("day").isNotNull()).collect()
    }
    for r in batch_daily.collect():
        assert got[r["day"]] == r["est"]

    # replay: merging the same half again leaves every estimate unchanged
    # (HLL registers are idempotent over values; the serialized blob may
    # legally re-encode — sparse vs dense — so the pin is estimate-level)
    key = lambda t: (t[0] is None, t[0], t[1])
    before = sorted(
        ((r["day"], r["est"]) for r in daily_estimates(spark, path).collect()),
        key=key,
    )
    upsert_hll_batch(spark, half2, path)
    after = sorted(
        ((r["day"], r["est"]) for r in daily_estimates(spark, path).collect()),
        key=key,
    )
    assert before == after

    # accuracy: every estimate within 5% of exact (lgk=12 ~ 1.6% stderr)
    exact = {
        r["day"]: r["n"]
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for day, est in got.items():
        assert abs(est - exact[day]) <= exact[day] * 0.05


def test_stream_drive_file_source(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("ts", "user_id")
    src = str(tmp_path / "src")
    ev.filter(F.col("user_id") % 2 == 0).write.parquet(src)
    path, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")

    stats = []
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = maintain_hll_stream(
        stream, path, ckpt, trigger="1 seconds", on_batch=stats.append
    )
    try:
        q.processAllAvailable()
        # second file lands mid-stream: the next trigger merges it in
        ev.filter(F.col("user_id") % 2 == 1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(s["n_batch_rows"] for s in stats) == ev.count()

    merged_row = (
        daily_estimates(spark, path).filter(F.col("day").isNull()).collect()[0]
    )
    exact_total = ev.select("user_id").distinct().count()
    assert abs(merged_row["est"] - exact_total) <= exact_total * 0.05


def test_rolling_estimates_deduplicate_across_days(spark, sf_small, tmp_path):
    """Rolling 7-day estimates equal the exact rolling distinct within
    the 5% HLL bound — and are far below the naive sum of daily
    distincts when users repeat across days."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.hll_stream import (
        rolling_estimates,
    )

    ev = load_table(spark, sf_small, "events").select("ts", "user_id")
    path = str(tmp_path / "sk")
    upsert_hll_batch(spark, ev, path)

    got = {r["day"]: r["est"] for r in rolling_estimates(spark, path, 7).collect()}
    days = ev.select(F.to_date("ts").alias("day"), "user_id")
    exact = {
        r["day"]: r["n"]
        for r in days.alias("a")
        .join(
            days.alias("b"),
            (F.col("b.day") <= F.col("a.day"))
            & (F.col("b.day") > F.date_sub(F.col("a.day"), 7)),
        )
        .groupBy("a.day")
        .agg(F.count_distinct("b.user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for day, est in got.items():
        assert abs(est - exact[day]) <= exact[day] * 0.05
    # dedup across days really matters on this fixture: naive daily sum
    # over a full window overshoots the rolling distinct
    daily = {
        r["day"]: r["n"]
        for r in days.groupBy("day").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    full_days = [d for d in exact if sum(1 for e in daily if 0 <= (d - e).days < 7) == 7]
    assert any(
        sum(v for e, v in daily.items() if 0 <= (d - e).days < 7) > exact[d] * 1.2
        for d in full_days
    )


def test_hll_versioned_upsert_on_viewfs(spark, sf_small, viewfs_root):
    """r7: the HLL upsert now uses the versioned-dir pattern (no driver
    collect of the sketch table) and the shared scheme-aware cleanup —
    drive two upserts through a real viewfs:// mount: estimates stay
    exact-ish, only the live version dir survives in the backing store."""
    import os

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        load_table,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.hll_stream import (
        daily_estimates,
    )

    uri, backing = viewfs_root
    ev = load_table(spark, sf_small, "events")
    path = f"{uri}/hll_vfs"
    s1 = upsert_hll_batch(spark, ev.filter(F.col("user_id") % 2 == 0), path)
    s2 = upsert_hll_batch(spark, ev.filter(F.col("user_id") % 2 == 1), path)
    assert (s1["version"], s2["version"]) == (0, 1)
    vdirs = sorted(
        d for d in os.listdir(os.path.join(backing, "hll_vfs"))
        if d.startswith("sketch_v")
    )
    assert vdirs == ["sketch_v1"], vdirs
    exact = ev.select("user_id").distinct().count()
    total = [
        r["est"] for r in daily_estimates(spark, path).collect() if r["day"] is None
    ][0]
    assert abs(total - exact) / exact < 0.05
