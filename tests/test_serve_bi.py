"""BI serving endpoint (S11): real HTTP requests against the live server."""

import json
import sys
import urllib.error
import urllib.request

sys.path.insert(0, "/root/repo/jobs")

from serve_bi import _assert_read_only, _is_read_only, serve_background  # noqa: E402

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (  # noqa: E402
    register_views,
)


def _post(url, doc):
    req = urllib.request.Request(
        url, data=json.dumps(doc).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_serving_roundtrip(spark, sf_oracle):
    register_views(spark, sf_oracle)
    srv, _ = serve_background(spark, port=0, max_rows=50)
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        with urllib.request.urlopen(base + "/health", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True
        with urllib.request.urlopen(base + "/tables", timeout=10) as r:
            tables = json.loads(r.read())["tables"]
        assert {"region", "nation", "orders", "lineitem"} <= set(tables)

        out = _post(
            base + "/sql",
            {"sql": "SELECT r_name, count(*) AS n FROM region GROUP BY r_name", "limit": 10},
        )
        assert out["columns"] == ["r_name", "n"]
        assert out["n_rows"] == 5 and not out["truncated"]

        # row cap enforced and reported
        out = _post(base + "/sql", {"sql": "SELECT * FROM orders", "limit": 7})
        assert out["n_rows"] == 7 and out["truncated"] is True

        # writes rejected with 400, session state untouched
        try:
            _post(base + "/sql", {"sql": "DROP VIEW region"})
            raise AssertionError("write statement must be rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert spark.sql("SELECT count(*) FROM region").collect()[0][0] == 5
    finally:
        srv.shutdown()


def test_read_only_guard():
    assert _is_read_only("SELECT 1")
    assert _is_read_only("  with x as (select 1) select * from x;")
    assert _is_read_only("/* c */ SELECT 1 -- t")
    assert not _is_read_only("DROP TABLE t")
    assert not _is_read_only("SELECT 1; DROP TABLE t")
    assert not _is_read_only("INSERT INTO t VALUES (1)")
    assert not _is_read_only("SET spark.sql.ansi.enabled=false")
    assert not _is_read_only("")


def _rejected(spark, sql):
    try:
        _assert_read_only(spark, sql)
        return False
    except ValueError:
        return True


def test_plan_level_guard(spark, tmp_path):
    # Accepted: genuine queries, however they start.
    _assert_read_only(spark, "SELECT 1")
    _assert_read_only(spark, "WITH c AS (SELECT 1 AS x) SELECT * FROM c")
    _assert_read_only(spark, "VALUES (1, 'a'), (2, 'b')")
    _assert_read_only(spark, "EXPLAIN SELECT 1")
    _assert_read_only(spark, "SHOW TABLES")
    # A column merely *named* like a write keyword must still pass
    # (plan-node check, not token grep).
    _assert_read_only(spark, "SELECT 1 AS insert_ts, 2 AS update_count")

    # The round-2 advisor bypass: first keyword WITH, plan root INSERT.
    target = tmp_path / "exfil"
    bypass = (
        f"WITH c AS (SELECT 1 AS x) INSERT OVERWRITE DIRECTORY '{target}' "
        "USING parquet SELECT * FROM c"
    )
    assert _rejected(spark, bypass)
    assert not target.exists()

    # Other command shapes caught at the plan level.
    assert _rejected(spark, "WITH c AS (SELECT 1) INSERT INTO tgt SELECT * FROM c")
    assert _rejected(spark, "CREATE TABLE t (a INT) USING parquet")
    assert _rejected(spark, "SELECT 1; DROP TABLE t")
    assert _rejected(spark, "CACHE TABLE region")
    assert _rejected(spark, "")


def test_http_rejects_with_insert_bypass(spark, sf_oracle, tmp_path):
    register_views(spark, sf_oracle)
    srv, _ = serve_background(spark, port=0, max_rows=50)
    base = f"http://127.0.0.1:{srv.server_port}"
    target = tmp_path / "exfil_http"
    try:
        try:
            _post(
                base + "/sql",
                {
                    "sql": (
                        f"WITH c AS (SELECT 1 AS x) INSERT OVERWRITE DIRECTORY "
                        f"'{target}' USING parquet SELECT * FROM c"
                    )
                },
            )
            raise AssertionError("WITH...INSERT bypass must be rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert not target.exists()
    finally:
        srv.shutdown()


def test_arrow_ipc_endpoint(spark, sf_oracle):
    """POST /sql.arrow returns an Arrow IPC stream whose values match the
    JSON endpoint, with n_rows/truncated in the schema metadata and the
    same read-only enforcement."""
    import pyarrow as pa

    register_views(spark, sf_oracle)
    srv, _ = serve_background(spark, port=0, max_rows=50)
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        body = json.dumps(
            {"sql": "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
             "limit": 3}
        ).encode()
        req = urllib.request.Request(
            base + "/sql.arrow", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "application/vnd.apache.arrow.stream"
            raw = r.read()
        table = pa.ipc.open_stream(raw).read_all()
        assert table.column_names == ["r_regionkey", "r_name"]
        assert table.num_rows == 3
        meta = table.schema.metadata
        assert meta[b"n_rows"] == b"3" and meta[b"truncated"] == b"true"

        json_out = _post(
            base + "/sql",
            {"sql": "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
             "limit": 3},
        )
        assert table.to_pydict()["r_regionkey"] == [r[0] for r in json_out["rows"]]
        assert table.to_pydict()["r_name"] == [r[1] for r in json_out["rows"]]

        # read-only enforcement applies to the arrow route too
        import pytest as _pt

        with _pt.raises(urllib.error.HTTPError) as ei:
            _req = urllib.request.Request(
                base + "/sql.arrow",
                data=json.dumps({"sql": "DROP VIEW region"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(_req, timeout=60)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_concurrent_dashboard_refresh(spark, sf_oracle):
    """DirectQuery posture smoke (VERDICT r6 item 9): 12 dashboard tiles
    fire star joins through /sql.arrow AT ONCE. Every response must be
    correct (checked against a pre-computed single-threaded answer) and
    no request may starve (generous absolute latency ceiling — the
    ThreadingHTTPServer handler threads share one SparkSession, whose
    scheduler interleaves the jobs)."""
    import threading
    import time

    import pyarrow as pa

    register_views(spark, sf_oracle)

    star = (
        "SELECT n.n_name AS nation, "
        "CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2)) * "
        "     (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS rev "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE n.n_name = 'NATION_{k}' GROUP BY n.n_name"
    )
    expected = {
        k: [tuple(r) for r in spark.sql(star.format(k=k)).collect()]
        for k in range(12)
    }

    srv, _ = serve_background(spark, port=0, max_rows=100)
    base = f"http://127.0.0.1:{srv.server_port}"
    results: dict[int, list] = {}
    latencies: dict[int, float] = {}
    errors: list = []
    barrier = threading.Barrier(12)

    def tile(k: int) -> None:
        try:
            body = json.dumps({"sql": star.format(k=k), "limit": 100}).encode()
            req = urllib.request.Request(
                base + "/sql.arrow", data=body,
                headers={"Content-Type": "application/json"},
            )
            barrier.wait(timeout=30)
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=120) as r:
                raw = r.read()
            latencies[k] = time.perf_counter() - t0
            tbl = pa.ipc.open_stream(raw).read_all().to_pydict()
            results[k] = list(zip(tbl["nation"], tbl["rev"]))
        except Exception as e:  # surface in the main thread
            errors.append((k, e))

    try:
        threads = [threading.Thread(target=tile, args=(k,)) for k in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=150)
        assert not errors, errors
        for k in range(12):
            assert results[k] == expected[k], f"tile {k} wrong under concurrency"
        # starvation bound: every tile answered well inside the ceiling
        worst = max(latencies.values())
        assert worst < 60, f"tile starved: worst latency {worst:.1f}s"
    finally:
        srv.shutdown()


def test_parts_view_stays_current_and_forgets_over_http(spark, tmp_path):
    """The BI-visible right-to-be-forgotten path (r8 advice + verdict):
    a parts-backed FINAL view is re-resolved per query, so dashboards see
    (a) commits landing AFTER server start and (b) a takedown — the same
    ``mutate_parts(delete_ids=...)`` rewrite ``forget_from_pipeline``
    issues for the curated table — immediately, with no restart."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        create_parts_table,
        insert_into_parts,
        mutate_parts,
    )

    tbl = str(tmp_path / "curated")
    create_parts_table(tbl, engine="replacing", key_cols=("doc_id",), version_col="v")
    insert_into_parts(
        spark.createDataFrame(
            [(1, 1, "keep"), (2, 1, "takedown-me")], "doc_id long, v long, s string"
        ),
        tbl,
    )
    srv, _ = serve_background(
        spark, port=0, max_rows=50, parts_views={"v_curated": tbl}
    )
    base = f"http://127.0.0.1:{srv.server_port}"
    q = {"sql": "SELECT doc_id FROM v_curated ORDER BY doc_id", "limit": 10}
    try:
        assert [r[0] for r in _post(base + "/sql", q)["rows"]] == [1, 2]
        # a commit AFTER server start is visible on the next query
        insert_into_parts(
            spark.createDataFrame([(3, 1, "late")], "doc_id long, v long, s string"),
            tbl,
        )
        assert [r[0] for r in _post(base + "/sql", q)["rows"]] == [1, 2, 3]
        # takedown: the forget-path parts mutation, then an immediate re-query
        mutate_parts(
            spark,
            tbl,
            delete_ids=spark.createDataFrame([(2,)], "doc_id long"),
            id_col="doc_id",
        )
        assert [r[0] for r in _post(base + "/sql", q)["rows"]] == [1, 3]
    finally:
        srv.shutdown()


def test_parts_final_view_served_over_http(spark, tmp_path):
    """A parts table registered as a FINAL view (the v_fact_event_latest
    posture): dashboards query latest-state through plain SQL while raw
    part rows stay invisible."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        create_parts_table,
        insert_into_parts,
        read_parts,
    )

    tbl = str(tmp_path / "t")
    create_parts_table(tbl, engine="replacing", key_cols=("k",), version_col="v")
    insert_into_parts(
        spark.createDataFrame([(1, 1, "old"), (2, 1, "keep")], "k long, v long, s string"),
        tbl,
    )
    insert_into_parts(
        spark.createDataFrame([(1, 2, "new")], "k long, v long, s string"), tbl
    )
    read_parts(spark, tbl, final=True).createOrReplaceTempView("dim_latest")

    srv, _ = serve_background(spark, port=0, max_rows=50)
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        out = _post(
            base + "/sql",
            {"sql": "SELECT k, s FROM dim_latest ORDER BY k", "limit": 10},
        )
        assert out["rows"] == [[1, "new"], [2, "keep"]]
    finally:
        srv.shutdown()
