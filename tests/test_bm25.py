"""BM25 retrieval operator — scoring semantics + persisted-index lifecycle."""

import math

import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.bm25 import (
    bm25_score_topk,
    bm25_topk_indexed,
    build_bm25_index,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "spark shuffles the big table"),
        (1, "spark broadcasts the small table"),
        (2, "the table the table the table"),
        (3, "ducks quack loudly"),
        (4, "spark shuffles the big table"),  # exact duplicate of doc 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_computed_score(spark, tiny):
    """Score of doc 3 for query 'ducks quack' verified against the closed
    form: every term unique to doc 3 (df=1, tf=1, dl=3)."""
    q = spark.createDataFrame([(99, "ducks quack")], "doc_id long, text string")
    out = {r["n_id"]: r["score"] for r in bm25_score_topk(tiny, q, k=5).collect()}
    n, df, tf, dl = 5, 1, 1, 3
    avgdl = (5 + 5 + 6 + 3 + 5) / 5
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    tf_norm = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert out[3] == round(2 * idf * tf_norm + 1e-9, 4)
    # no other doc contains a query term
    assert set(out) == {3}


def test_bm25_duplicate_docs_rank_by_id(spark, tiny):
    """Exact-duplicate docs 0 and 4 tie on the rounded score and order by
    id — the determinism contract the oracle replays."""
    q = spark.createDataFrame([(99, "spark shuffles")], "doc_id long, text string")
    got = bm25_score_topk(tiny, q, k=5).orderBy("rank").collect()
    r0 = [r for r in got if r["n_id"] == 0][0]
    r4 = [r for r in got if r["n_id"] == 4][0]
    assert r0["score"] == r4["score"]
    assert r0["rank"] + 1 == r4["rank"]


def test_bm25_self_match_excluded(spark, tiny):
    out = bm25_score_topk(tiny, tiny.filter(F.col("doc_id") == 0), k=5)
    assert 0 not in {r["n_id"] for r in out.collect()}
    # but its exact duplicate ranks first
    assert out.filter("rank = 1").collect()[0]["n_id"] == 4


def test_bm25_indexed_equals_direct(spark, tiny, tmp_path):
    """The persisted-index path returns exactly the direct path's frame."""
    idx = str(tmp_path / "bm25")
    meta = build_bm25_index(tiny, idx, term_buckets=8)
    assert meta["n_docs"] == 5
    q = spark.createDataFrame(
        [(100, "spark table"), (101, "ducks quack loudly")],
        "doc_id long, text string",
    )
    direct = bm25_score_topk(tiny, q, k=10).orderBy("q_id", "rank").collect()
    indexed = bm25_topk_indexed(spark, idx, q, k=10).orderBy("q_id", "rank").collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]


def test_bm25_index_prunes_term_buckets(spark, tiny, tmp_path):
    """The indexed read plan carries the query terms' bucket IN-list as a
    partition filter — unmatched term buckets are never scanned."""
    idx = str(tmp_path / "bm25p")
    build_bm25_index(tiny, idx, term_buckets=8)
    q = spark.createDataFrame([(100, "ducks")], "doc_id long, text string")
    plan = bm25_topk_indexed(spark, idx, q, k=10)._jdf.queryExecution().executedPlan().toString()
    # the single query-term bucket shows up as a PartitionFilters equality
    # (Catalyst collapses a 1-element IN) on every postings scan
    bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("ducks")), F.lit(8)).cast("int").alias("b")
    ).collect()[0]["b"]
    import re

    assert re.search(
        rf"PartitionFilters: \[[^\]]*term_bucket#\d+ = {bucket}\)", plan
    ), plan


def test_bm25_append_equals_fresh_and_replay_converges(spark, tiny, tmp_path):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.bm25 import (
        append_to_bm25_index,
    )

    base = tiny.filter(F.col("doc_id") < 3)
    batch = tiny.filter(F.col("doc_id") >= 3)
    inc = str(tmp_path / "inc")
    build_bm25_index(base, inc, term_buckets=8)

    s = append_to_bm25_index(spark, inc, batch)
    assert s == {"n_batch": 2, "n_appended": 2, "n_replayed": 0}
    s2 = append_to_bm25_index(spark, inc, batch)
    assert s2 == {"n_batch": 2, "n_appended": 0, "n_replayed": 2}

    fresh = str(tmp_path / "fresh")
    build_bm25_index(tiny, fresh, term_buckets=8)
    q = spark.createDataFrame(
        [(100, "spark table"), (101, "ducks quack loudly")],
        "doc_id long, text string",
    )
    a = bm25_topk_indexed(spark, inc, q, k=10).orderBy("q_id", "rank").collect()
    b = bm25_topk_indexed(spark, fresh, q, k=10).orderBy("q_id", "rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) > 0
    # meta self-heal recomputed the corpus stats
    meta = spark.read.parquet(f"{inc}/meta").collect()[0]
    assert meta["n_docs"] == 5


def test_bm25_indexed_read_repairs_duplicated_postings(spark, tiny, tmp_path):
    """Crash-window simulation: postings appended twice without doclen —
    the defensive max(tf) read restores exact scores."""
    idx = str(tmp_path / "dup")
    build_bm25_index(tiny, idx, term_buckets=8)
    q = spark.createDataFrame([(100, "spark table")], "doc_id long, text string")
    clean = bm25_topk_indexed(spark, idx, q, k=10).orderBy("rank").collect()

    # duplicate every postings row (what a retried append after a crash
    # between the postings and doclen writes leaves behind)
    p = spark.read.parquet(f"{idx}/postings").localCheckpoint()
    p.write.partitionBy("term_bucket").mode("append").parquet(f"{idx}/postings")

    repaired = bm25_topk_indexed(spark, idx, q, k=10).orderBy("rank").collect()
    assert [tuple(r) for r in repaired] == [tuple(r) for r in clean]


def test_bm25_matches_python_reference_on_random_corpora(spark):
    """Property test: on arbitrary small corpora (richer vocabulary than
    the fixture's 31 words), the engine's BM25 scores match a from-
    scratch Python reference to float tolerance and agree on the
    candidate sets."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = [f"w{i}" for i in range(50)]
    doc_strategy = st.lists(
        st.sampled_from(words), min_size=1, max_size=30
    ).map(" ".join)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(doc_strategy, min_size=3, max_size=12),
        q_text=doc_strategy,
    )
    def run(docs, q_text):
        corpus = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
        )
        q = spark.createDataFrame([(999, q_text)], "doc_id long, text string")
        got = {
            r["n_id"]: r["score"]
            for r in bm25_score_topk(corpus, q, k=1000).collect()
        }

        # reference: same formula, straight Python floats
        tfs = [Counter(t.split()) for t in docs]
        dls = [sum(c.values()) for c in tfs]
        n = len(docs)
        avgdl = sum(dls) / n
        expect = {}
        for term in set(q_text.split()):
            df = sum(1 for c in tfs if term in c)
            if df == 0:
                continue
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            for d, c in enumerate(tfs):
                tf = c.get(term, 0)
                if tf == 0:
                    continue
                tf_norm = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
                expect[d] = expect.get(d, 0.0) + idf * tf_norm
        assert set(got) == set(expect)
        for d, s in expect.items():
            assert abs(got[d] - round(s + 1e-9, 4)) < 2e-4, (d, got[d], s)

    run()


def test_bm25_exclude_self_opt_out(spark, tiny):
    """exclude_self=False keeps a candidate whose doc_id collides with the
    query id — the external-query-namespace case (advice r6)."""
    q = spark.createDataFrame([(0, "ducks quack")], "doc_id long, text string")
    # colliding q_id=0 vs doc 0: doc 3 is the only term match either way
    out = bm25_score_topk(tiny, q, k=5, exclude_self=False).collect()
    assert {r["n_id"] for r in out} == {3}
    q2 = spark.createDataFrame([(4, "spark shuffles")], "doc_id long, text string")
    with_self = {r["n_id"] for r in bm25_score_topk(tiny, q2, k=5, exclude_self=False).collect()}
    without = {r["n_id"] for r in bm25_score_topk(tiny, q2, k=5).collect()}
    assert 4 in with_self and 4 not in without


def test_bm25_append_with_empty_doc_matches_fresh_build(spark, tiny, tmp_path):
    """Advice r6 (medium): a zero-token doc in an append batch must not
    shift n_docs/avgdl — appended index ≡ fresh build over the union,
    scores included."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.bm25 import (
        append_to_bm25_index,
    )

    p_app = str(tmp_path / "bm25_app")
    p_fresh = str(tmp_path / "bm25_fresh")
    batch = spark.createDataFrame(
        [(10, "spark joins the table"), (11, "   "), (12, "")],
        "doc_id long, text string",
    )
    build_bm25_index(tiny, p_app, term_buckets=8)
    append_to_bm25_index(spark, p_app, batch)
    build_bm25_index(tiny.unionByName(batch), p_fresh, term_buckets=8)

    ma = spark.read.parquet(f"{p_app}/meta").collect()[0]
    mf = spark.read.parquet(f"{p_fresh}/meta").collect()[0]
    assert ma["n_docs"] == mf["n_docs"] == 6  # 5 tiny + 1 tokenful batch doc
    assert ma["avgdl"] == mf["avgdl"]

    q = spark.createDataFrame([(99, "spark table")], "doc_id long, text string")
    got_a = sorted(map(tuple, bm25_topk_indexed(spark, p_app, q, k=10).collect()))
    got_f = sorted(map(tuple, bm25_topk_indexed(spark, p_fresh, q, k=10).collect()))
    assert got_a == got_f
    # both registries carry the dl=0 rows (replay guard sees empty docs)
    for p in (p_app, p_fresh):
        dl0 = {
            r["doc_id"]
            for r in spark.read.parquet(f"{p}/doclen").filter("dl = 0").collect()
        }
        assert dl0 == {11, 12}, p
    # replaying the same batch appends nothing
    res = append_to_bm25_index(spark, p_app, batch)
    assert res["n_appended"] == 0 and res["n_replayed"] == 3


def test_bm25_postings_cache_pins_single_entry(spark, tiny):
    """ADVICE r12: the session postings cache must hold at most ONE
    (corpus, query-set) entry — same-corpus entries with a different
    query-set hash evict the previous one instead of accumulating as
    persisted DataFrames."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators import (
        bm25 as mod,
    )

    mod.clear_postings_cache()
    try:
        q1 = tiny.filter(F.col("doc_id") < 2)
        q2 = tiny.filter(F.col("doc_id") < 3)  # different plan -> different qkey
        bm25_score_topk(tiny, q1, k=3, cache_key="t").collect()
        assert len(mod._POSTINGS_CACHE) == 1
        bm25_score_topk(tiny, q2, k=3, cache_key="t").collect()
        assert len(mod._POSTINGS_CACHE) == 1
        # same corpus + same query plan reuses (still one entry)
        bm25_score_topk(tiny, q2, k=3, cache_key="t").collect()
        assert len(mod._POSTINGS_CACHE) == 1
        # different corpus key evicts too
        bm25_score_topk(tiny, q2, k=3, cache_key="u").collect()
        assert len(mod._POSTINGS_CACHE) == 1
    finally:
        mod.clear_postings_cache()
