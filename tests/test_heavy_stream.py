"""Streaming count-min maintenance: merge equals one-shot sketch,
batch-id replay guard, exact heavy hitters off the standing sketch,
live stream drive."""

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
    cm_sketch,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.heavy_stream import (
    heavy_hitters_from_sketch,
    load_key_sketch,
    maintain_cm_sketch_stream,
    upsert_cm_sketch_batch,
)


def _cells(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_merges_exactly_and_guards_replay(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("user_id")
    h1 = ev.filter(F.col("user_id") % 2 == 0)
    h2 = ev.filter(F.col("user_id") % 2 == 1)
    path = str(tmp_path / "cm")

    s1 = upsert_cm_sketch_batch(spark, h1, path, ["user_id"], batch_id=0)
    assert s1["applied"] and s1["version"] == 0
    s2 = upsert_cm_sketch_batch(spark, h2, path, ["user_id"], batch_id=1)
    assert s2["applied"] and s2["version"] == 1

    # merged incrementally == one-shot sketch of the union (cell-exact)
    merged = load_key_sketch(spark, path)
    oneshot = cm_sketch(ev, ["user_id"])
    assert _cells(merged.df) == _cells(oneshot)

    # replayed batch id: skipped, state unchanged
    s3 = upsert_cm_sketch_batch(spark, h2, path, ["user_id"], batch_id=1)
    assert not s3["applied"] and s3["version"] == 1
    assert _cells(load_key_sketch(spark, path).df) == _cells(oneshot)

    # parameter-mismatch safety
    import pytest

    with pytest.raises(ValueError, match="different parameters"):
        upsert_cm_sketch_batch(
            spark, h2, path, ["user_id"], batch_id=2, width=1024
        )


def test_heavy_hitters_from_standing_sketch_exact(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("user_id")
    path = str(tmp_path / "cm")
    upsert_cm_sketch_batch(
        spark, ev.filter(F.col("user_id") % 2 == 0), path, ["user_id"], 0
    )
    upsert_cm_sketch_batch(
        spark, ev.filter(F.col("user_id") % 2 == 1), path, ["user_id"], 1
    )
    t = 40
    got = {
        r["user_id"]: r["cnt"]
        for r in heavy_hitters_from_sketch(spark, path, ev, t).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= t)
        .collect()
    }
    assert got == exact and len(exact) > 0


def test_stream_drive_builds_sketch(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("user_id")
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    path, ckpt = str(tmp_path / "cm"), str(tmp_path / "ckpt")
    stats = []
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = maintain_cm_sketch_stream(
        stream, path, ckpt, ["user_id"], trigger="1 seconds",
        on_batch=stats.append,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(s["n_batch_rows"] for s in stats if s["applied"]) == ev.count()
    assert _cells(load_key_sketch(spark, path).df) == _cells(
        cm_sketch(ev, ["user_id"])
    )


def test_superseded_versions_cleaned_on_viewfs(spark, sf_small, viewfs_root):
    """Advice r6: version cleanup must work on non-``file`` schemes — the
    old shutil.rmtree silently no-oped there and sketch_v dirs accumulated
    forever. Drives three upserts through a real viewfs:// mount and
    checks (via the backing local dir) that only the live version
    survives."""
    import os

    uri, backing = viewfs_root
    ev = load_table(spark, sf_small, "events").select("user_id")
    path = f"{uri}/cm_vfs"
    for b, pred in enumerate([0, 1, 2]):
        upsert_cm_sketch_batch(
            spark, ev.filter(F.col("user_id") % 3 == pred), path,
            ["user_id"], batch_id=b,
        )
    vdirs = sorted(
        d for d in os.listdir(os.path.join(backing, "cm_vfs"))
        if d.startswith("sketch_v")
    )
    assert vdirs == ["sketch_v2"], vdirs
    # the standing sketch still answers exactly
    total = sum(
        r["cnt"]
        for r in load_key_sketch(spark, path).df.filter("i = 0").collect()
    )
    assert total == ev.count()
