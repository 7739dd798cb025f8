"""Full-pipeline crash soak (VERDICT r6 item 2): one document/embedding
stream driven through EVERY ingest stage — quality gate, dedup absorb,
BM25 append, HLL + count-min maintenance, semdedup, IVF and IVF-PQ
appends — with a crash injected at EVERY inter-stage boundary somewhere
in the batch sequence, each crash followed by the at-least-once retry
(re-run the whole batch). The final state of all four indexes, both
sketches, and the survivors table must equal (a) a crash-free run of the
same sequence and (b) batch-built equivalents over the same data where
an exact batch twin exists (BM25 fresh build, on-the-fly PQ encode,
one-shot count-min, one-shot HLL)."""

import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.pipeline import (
    STAGES,
    PipelinePaths,
    ingest_pipeline_batch,
    maintain_pipeline_streams,
)

N_BATCHES = 3

#: every stage boundary crashed exactly once across the sequence
CRASH_PLAN = {
    b: [s for i, s in enumerate(STAGES) if i % N_BATCHES == b]
    for b in range(N_BATCHES)
}


def _sources(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "source",
        F.to_timestamp(
            F.date_add(
                F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 7).cast("int")
            )
        ).alias("ts"),
    )
    embs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return docs, embs


def _run(spark, docs, embs, root, crash_plan):
    paths = PipelinePaths(str(root))
    log = []
    for b in range(N_BATCHES):
        db = docs.filter(F.col("doc_id") % N_BATCHES == b)
        eb = embs.filter(F.col("vec_id") % N_BATCHES == b)
        for stage in crash_plan.get(b, []):
            with pytest.raises(RuntimeError, match="injected crash"):
                ingest_pipeline_batch(spark, db, eb, paths, b, fail_after=stage)
        log.append(ingest_pipeline_batch(spark, db, eb, paths, b))
    return paths, log


def _rows(df, *cols):
    sel = df.select(*cols) if cols else df
    # key=repr: None-safe (daily_estimates emits a NULL-day total row)
    return sorted((tuple(r) for r in sel.collect()), key=repr)


def test_full_pipeline_crash_soak(spark, sf_small, tmp_path):
    docs, embs = _sources(spark, sf_small)
    crashed, log_c = _run(spark, docs, embs, tmp_path / "crashed", CRASH_PLAN)
    clean, log_clean = _run(spark, docs, embs, tmp_path / "clean", {})

    # every boundary was actually exercised
    assert sorted(sum(CRASH_PLAN.values(), [])) == sorted(STAGES)
    # stateless accounting is attempt-independent; STATEFUL stage counts are
    # NOT compared per-attempt — a crash attempt that got past a stage
    # persisted its work, so the successful retry correctly reports 0 new
    # (replay-skip). State equality below is the contract.
    for sc, scl in zip(log_c, log_clean):
        assert sc["quality"] == scl["quality"]

    # ---- state equality: crashed == crash-free ---------------------------
    for rel, cols in [
        ("dedup_index/doc_ids", ("_cid",)),
        ("bm25_index/doclen", ("doc_id", "dl")),
        ("ivf_index/vectors", ("n_id",)),
        ("ivfpq_index/codes", ("n_id", "cell")),
        ("sem_survivors", ("vec_id", "cell")),
    ]:
        a = _rows(spark.read.parquet(f"{crashed.root}/{rel}"), *cols)
        b = _rows(spark.read.parquet(f"{clean.root}/{rel}"), *cols)
        assert a == b, f"{rel} diverged under crash-replay"

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.hll_stream import (
        daily_estimates,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.heavy_stream import (
        load_key_sketch,
    )

    est_c = _rows(daily_estimates(spark, crashed.hll))
    est_cl = _rows(daily_estimates(spark, clean.hll))
    assert est_c == est_cl
    cm_c = _rows(load_key_sketch(spark, crashed.countmin).df)
    cm_cl = _rows(load_key_sketch(spark, clean.countmin).df)
    assert cm_c == cm_cl

    # ---- batch-twin equality where an exact twin exists ------------------
    # BM25: fresh build over the accepted union answers identically
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.bm25 import (
        bm25_topk_indexed,
        build_bm25_index,
    )

    accepted_ids = spark.read.parquet(f"{crashed.root}/dedup_index/doc_ids").select(
        F.col("_cid").alias("doc_id")
    )
    accepted_docs = docs.join(accepted_ids, "doc_id", "left_semi")
    build_bm25_index(accepted_docs, str(tmp_path / "bm25_fresh"), term_buckets=16)
    queries = docs.filter(F.col("doc_id") < 3).select("doc_id", "text")
    got = _rows(bm25_topk_indexed(spark, str(crashed.bm25_index), queries, k=5))
    want = _rows(
        bm25_topk_indexed(spark, str(tmp_path / "bm25_fresh"), queries, k=5)
    )
    assert got == want, "appended BM25 diverged from fresh build over union"
    meta_a = spark.read.parquet(f"{crashed.bm25_index}/meta").collect()[0]
    meta_f = spark.read.parquet(f"{tmp_path}/bm25_fresh/meta").collect()[0]
    assert (meta_a["n_docs"], meta_a["avgdl"]) == (meta_f["n_docs"], meta_f["avgdl"])

    # IVF-PQ: appended codes == on-the-fly encode under the frozen quantizers
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.ivf import (
        assign_cells_df,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.pq import (
        load_ivfpq_index,
        pq_encode,
    )

    _codes, centroids, books = load_ivfpq_index(spark, str(crashed.ivfpq_index))
    direct = pq_encode(
        assign_cells_df(embs, centroids), books, extra_cols=("cell",)
    )
    got_codes = {
        (r["n_id"], r["cell"], tuple(r["code"]))
        for r in spark.read.parquet(f"{crashed.ivfpq_index}/codes").collect()
    }
    want_codes = {
        (r["n_id"], r["cell"], tuple(r["code"])) for r in direct.collect()
    }
    assert got_codes == want_codes

    # count-min: merged batches == one-shot sketch of the whole stream
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.heavy import (
        cm_sketch,
    )

    one_shot = _rows(cm_sketch(docs, ["source"]))
    assert cm_c == one_shot

    # HLL: merged batches == one-shot upsert over the whole stream
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.hll_stream import (
        upsert_hll_batch,
    )

    upsert_hll_batch(spark, docs, str(tmp_path / "hll_oneshot"), key_col="doc_id")
    assert est_c == _rows(daily_estimates(spark, str(tmp_path / "hll_oneshot")))

    # dedup accounting closes on the CLEAN run (its attempts are the only
    # complete record — crashed-run retries replay-skip work already owned)
    n_accepted = sum(s["dedup_absorb"]["n_accepted"] for s in log_clean)
    assert n_accepted == accepted_ids.count()

    # curated parts table: crashed == clean, rows == the accepted set, and
    # the by_source projection answers the mixture rollup from states
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        read_parts,
        read_projection,
    )

    cur_c = _rows(read_parts(spark, crashed.curated), "doc_id", "source", "n", "chars")
    cur_cl = _rows(read_parts(spark, clean.curated), "doc_id", "source", "n", "chars")
    assert cur_c == cur_cl, "curated parts diverged under crash-replay"
    assert sorted(r[0] for r in cur_c) == sorted(
        r.doc_id for r in accepted_ids.collect()
    )
    proj = {
        (r.source, r.n) for r in read_projection(spark, clean.curated, "by_source").collect()
    }
    base = {
        (r.source, r.n)
        for r in read_parts(spark, clean.curated)
        .groupBy("source")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert proj == base


def test_streaming_twin_equals_batch_pipeline(spark, sf_small, tmp_path):
    """The foreachBatch twin (maintain_pipeline_streams) lands the exact
    state the batch driver lands for the same two-wave batch split —
    indexes, sketches, and survivors all equal."""
    docs, embs = _sources(spark, sf_small)
    docs = docs.filter(F.col("doc_id") < 200)
    embs = embs.filter(F.col("vec_id") < 200)
    waves = [
        (docs.filter(F.col("doc_id") % 2 == w), embs.filter(F.col("vec_id") % 2 == w))
        for w in range(2)
    ]

    # ---- batch driver ----------------------------------------------------
    bp = PipelinePaths(str(tmp_path / "batch"))
    for b, (dw, ew) in enumerate(waves):
        ingest_pipeline_batch(spark, dw, ew, bp, b)

    # ---- streaming twin: one wave per epoch ------------------------------
    dsrc, esrc = str(tmp_path / "dsrc"), str(tmp_path / "esrc")
    sp = PipelinePaths(str(tmp_path / "stream"))
    waves[0][0].coalesce(1).write.parquet(dsrc)
    waves[0][1].coalesce(1).write.parquet(esrc)
    dstream = spark.readStream.schema(
        spark.read.parquet(dsrc).schema
    ).parquet(dsrc)
    estream = spark.readStream.schema(
        spark.read.parquet(esrc).schema
    ).parquet(esrc)
    dq, eq = maintain_pipeline_streams(
        dstream, estream, sp, str(tmp_path / "ckpt"), trigger="1 seconds"
    )
    try:
        dq.processAllAvailable()
        eq.processAllAvailable()
        waves[1][0].coalesce(1).write.mode("append").parquet(dsrc)
        waves[1][1].coalesce(1).write.mode("append").parquet(esrc)
        dq.processAllAvailable()
        eq.processAllAvailable()
    finally:
        dq.stop()
        eq.stop()

    for rel, cols in [
        ("dedup_index/doc_ids", ("_cid",)),
        ("bm25_index/doclen", ("doc_id", "dl")),
        ("ivf_index/vectors", ("n_id",)),
        ("ivfpq_index/codes", ("n_id", "cell")),
        ("sem_survivors", ("vec_id", "cell")),
    ]:
        a = _rows(spark.read.parquet(f"{sp.root}/{rel}"), *cols)
        b = _rows(spark.read.parquet(f"{bp.root}/{rel}"), *cols)
        assert a == b, f"{rel}: streaming twin diverged from batch driver"

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        read_parts as _read_parts,
    )

    assert _rows(_read_parts(spark, sp.curated), "doc_id", "source") == _rows(
        _read_parts(spark, bp.curated), "doc_id", "source"
    ), "curated parts: streaming twin diverged from batch driver"

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.hll_stream import (
        daily_estimates,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.heavy_stream import (
        load_key_sketch,
    )

    assert _rows(daily_estimates(spark, sp.hll)) == _rows(
        daily_estimates(spark, bp.hll)
    )
    assert _rows(load_key_sketch(spark, sp.countmin).df) == _rows(
        load_key_sketch(spark, bp.countmin).df
    )


def test_streaming_twin_restart_from_checkpoint(spark, sf_small, tmp_path):
    """Kill both pipeline streams between waves and restart them on the
    same checkpoints: the epoch sequence continues (count-min batch-id
    watermark stays monotonic) and the final state equals the batch
    driver's — durability, not just liveness."""
    docs, embs = _sources(spark, sf_small)
    docs = docs.filter(F.col("doc_id") < 150)
    embs = embs.filter(F.col("vec_id") < 150)
    waves = [
        (docs.filter(F.col("doc_id") % 2 == w), embs.filter(F.col("vec_id") % 2 == w))
        for w in range(2)
    ]
    bp = PipelinePaths(str(tmp_path / "batch"))
    for b, (dw, ew) in enumerate(waves):
        ingest_pipeline_batch(spark, dw, ew, bp, b)

    dsrc, esrc = str(tmp_path / "dsrc"), str(tmp_path / "esrc")
    sp = PipelinePaths(str(tmp_path / "stream"))
    ckpt = str(tmp_path / "ckpt")

    def _start():
        dstream = spark.readStream.schema(
            spark.read.parquet(dsrc).schema
        ).parquet(dsrc)
        estream = spark.readStream.schema(
            spark.read.parquet(esrc).schema
        ).parquet(esrc)
        return maintain_pipeline_streams(
            dstream, estream, sp, ckpt, trigger="1 seconds"
        )

    waves[0][0].coalesce(1).write.parquet(dsrc)
    waves[0][1].coalesce(1).write.parquet(esrc)
    dq, eq = _start()
    try:
        dq.processAllAvailable()
        eq.processAllAvailable()
    finally:
        dq.stop()
        eq.stop()

    # streams are DOWN while wave 2 lands; the restart must pick it up
    waves[1][0].coalesce(1).write.mode("append").parquet(dsrc)
    waves[1][1].coalesce(1).write.mode("append").parquet(esrc)
    dq, eq = _start()
    try:
        dq.processAllAvailable()
        eq.processAllAvailable()
    finally:
        dq.stop()
        eq.stop()

    for rel, cols in [
        ("dedup_index/doc_ids", ("_cid",)),
        ("bm25_index/doclen", ("doc_id", "dl")),
        ("ivf_index/vectors", ("n_id",)),
        ("ivfpq_index/codes", ("n_id", "cell")),
        ("sem_survivors", ("vec_id", "cell")),
    ]:
        a = _rows(spark.read.parquet(f"{sp.root}/{rel}"), *cols)
        b = _rows(spark.read.parquet(f"{bp.root}/{rel}"), *cols)
        assert a == b, f"{rel}: restarted twin diverged from batch driver"

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.streaming.heavy_stream import (
        load_key_sketch,
    )

    assert _rows(load_key_sketch(spark, sp.countmin).df) == _rows(
        load_key_sketch(spark, bp.countmin).df
    )


def test_pipeline_forget_integration(spark, sf_small, tmp_path):
    """Takedown against a soaked pipeline state: forget a slice of docs
    and vectors, vacuum, and the BM25 index answers exactly as a fresh
    build over the surviving accepted set; the vector indexes and
    survivors drop exactly the forgotten ids."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.bm25 import (
        bm25_topk_indexed,
        build_bm25_index,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.forget import (
        forget_from_pipeline,
        vacuum_dedup_index,
    )

    docs, embs = _sources(spark, sf_small)
    docs = docs.filter(F.col("doc_id") < 200)
    embs = embs.filter(F.col("vec_id") < 200)
    paths = PipelinePaths(str(tmp_path / "state"))
    ingest_pipeline_batch(spark, docs, embs, paths, 0)

    gone_docs = docs.filter(F.col("doc_id") % 7 == 0)
    gone_vecs = embs.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    out = forget_from_pipeline(spark, paths, docs=gone_docs, vec_ids=gone_vecs)
    assert out["dedup"]["n_tombstoned"] > 0
    vacuum_dedup_index(spark, paths.dedup_index)

    # no forgotten id survives anywhere
    accepted = {
        r["_cid"]
        for r in spark.read.parquet(f"{paths.dedup_index}/doc_ids").collect()
    }
    assert not any(i % 7 == 0 for i in accepted)
    for rel, col in [
        (f"{paths.bm25_index}/doclen", "doc_id"),
        (f"{paths.ivf_index}/vectors", "n_id"),
        (f"{paths.ivfpq_index}/codes", "n_id"),
        (paths.survivors, "vec_id"),
    ]:
        left = {r[col] for r in spark.read.parquet(rel).select(col).collect()}
        assert not any(i % 7 == 0 for i in left), rel

    # the curated parts table was mutated too (per-part anti-join rewrite),
    # its by_source projection re-aggregates only survivors, and the
    # takedown is visible to BI FINAL reads immediately
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        read_parts,
        read_projection,
    )

    assert out["curated"]["rewritten"] >= 1
    cur = {r.doc_id for r in read_parts(spark, paths.curated).collect()}
    assert cur == {i for i in accepted}
    proj_n = sum(
        r.n for r in read_projection(spark, paths.curated, "by_source").collect()
    )
    assert proj_n == len(cur)

    # BM25 answers as a fresh build over the surviving accepted docs
    surv = docs.join(
        spark.read.parquet(f"{paths.dedup_index}/doc_ids").select(
            F.col("_cid").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    build_bm25_index(surv, str(tmp_path / "fresh"), term_buckets=16)
    qs = docs.filter("doc_id IN (1, 2, 3)").select("doc_id", "text")
    got = _rows(bm25_topk_indexed(spark, paths.bm25_index, qs, k=5))
    want = _rows(bm25_topk_indexed(spark, str(tmp_path / "fresh"), qs, k=5))
    assert got == want
