#!/usr/bin/env python
"""Job: BI serving endpoint — SQL over HTTP against the registered views.

    python jobs/serve_bi.py [--sf-dir DIR] [--port 8808] [--max-rows 10000]

The reference serves its warehouse to Power BI via DirectQuery
(`README.md:462-466`: ClickHouse as the live SQL backend). This engine's
serving layer is the same contract re-expressed for Spark: every gold
table/view is registered in the session catalog and an HTTP endpoint
accepts read-only SQL, executes it through Catalyst, and streams back JSON
— the shape any BI tool's web connector (or a thin ODBC gateway) consumes.

Scope notes, stated honestly:

- The container has no Thrift/grpc runtime, so a HiveServer2 or Spark
  Connect endpoint cannot run here; the HTTP layer is stdlib
  ``ThreadingHTTPServer``. On a real cluster you'd front the same
  registered views with Spark Connect / the Thrift server — the *catalog
  registration and read-only enforcement in this module carry over
  unchanged*.
- Serving capacity comes from Spark's scheduler: each request is a
  ``spark.sql`` job on the shared session, fair-scheduled across threads
  (``spark.scheduler.mode=FAIR`` recommended for mixed dashboards).
- Results are capped (``--max-rows``, enforced with a LIMIT wrapper so the
  cap prunes work inside Spark via TakeOrderedAndProject/CollectLimit —
  not after collecting).

Endpoints:

- ``GET  /health``   → ``{"ok": true}``
- ``GET  /tables``   → registered view names
- ``POST /sql``      → body ``{"sql": "SELECT ...", "limit": 100}``;
  returns ``{"columns": [...], "rows": [[...]], "n_rows": N,
  "truncated": bool}``.
- ``POST /sql.arrow`` → same request body; returns the result as an
  **Arrow IPC stream** (``application/vnd.apache.arrow.stream``) with
  ``n_rows``/``truncated`` in the schema metadata — the columnar wire
  format ADBC / Arrow Flight SQL / Spark Connect clients consume, and
  the throughput path for wide numeric dashboards (no per-value JSON
  encoding; ``df.toArrow`` keeps the collect Arrow end to end). Same
  read-only enforcement and row-cap semantics as ``/sql``. Read-only means: a single SELECT / WITH / VALUES /
  TABLE query — **parser-verified** (the statement is parsed with Spark's
  own SQL parser and rejected if any node of the logical plan is a
  command, DDL, or DML node, which closes the ``WITH ... INSERT`` hole a
  first-keyword check alone would allow) — or one of the metadata
  commands SHOW / DESCRIBE / EXPLAIN. Everything else is rejected with
  400 (read-only by construction, not by permissions).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
from datetime import date, datetime
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.S)


# Query-shaped statements: must ALSO pass the plan-node check below,
# because Spark's grammar admits `WITH c AS (...) INSERT ...` whose first
# keyword is WITH but whose plan root is InsertIntoStatement.
_QUERY_KEYWORDS = ("SELECT", "WITH", "VALUES", "TABLE")
# Metadata commands that never write; EXPLAIN only plans its child, it
# does not execute it. These parse to *Command nodes by design, so they
# are admitted by keyword and exempt from the deny-node scan.
_META_KEYWORDS = ("SHOW", "DESCRIBE", "DESC", "EXPLAIN")


def _first_keyword(sql: str) -> str:
    stripped = _COMMENT_RE.sub(" ", sql).strip().rstrip(";").strip()
    if ";" in stripped:
        return ""  # statement separator smuggling a second command
    return stripped.split(None, 1)[0].upper() if stripped else ""


def _is_read_only(sql: str) -> bool:
    """Textual pre-gate: single statement whose first significant keyword
    is query- or metadata-shaped. NOT sufficient alone (``WITH...INSERT``);
    ``_assert_read_only`` adds the parser-verified plan-node check."""
    return _first_keyword(sql) in _QUERY_KEYWORDS + _META_KEYWORDS


# Logical-plan node names that mean the statement writes or mutates state.
# Spark v2 DDL/DML nodes are NOT all suffixed `Command`/`Statement`
# (e.g. `CreateTableAsSelect`, `MergeIntoTable`), hence the prefix list.
_DENY_NODE_RE = re.compile(
    r".*(?:Command|Statement)$"
    r"|^(?:Insert|Overwrite|Write|Delete|Update|Merge|Create|Replace|Drop"
    r"|Alter|Truncate|Analyze|Cache|Uncache|Refresh|Load|Reset|Grant"
    r"|Revoke|Call|Vacuum|Optimize)"
    r"|^(?:Set|Use|Add)[A-Z_]"
)
# Textual fallback when the JVM parser is unreachable (e.g. Spark
# Connect): tokens that may never appear anywhere in an accepted query.
# Coarser than the plan check (a column literally named `insert` would be
# rejected), but errs closed, never open.
_DENY_TOKEN_RE = re.compile(
    r"\b(?:INSERT|OVERWRITE|DELETE|UPDATE|MERGE|CREATE|DROP|ALTER|TRUNCATE"
    r"|LOAD|GRANT|REVOKE|REFRESH|CACHE|UNCACHE|ANALYZE|VACUUM|CALL)\b",
    re.I,
)
_STRING_LIT_RE = re.compile(r"'(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.)*\"")


def _plan_node_names(jplan, out: list, depth: int = 0) -> None:
    """Collect simple class names of every node in a parsed (unresolved)
    logical plan, including subquery/CTE inner plans. Fails CLOSED on
    pathological nesting: returning silently at the cap would leave the
    deeper nodes unscanned — an attacker could bury a Command below it."""
    if depth > 500:
        raise ValueError(
            "read-only endpoint: statement nesting exceeds the 500-level "
            "scan cap; rejected"
        )
    out.append(jplan.getClass().getSimpleName())
    children = jplan.children()
    for i in range(children.size()):
        _plan_node_names(children.apply(i), out, depth + 1)
    inner = jplan.innerChildren()
    for i in range(inner.size()):
        _plan_node_names(inner.apply(i), out, depth + 1)


def _assert_read_only(spark: SparkSession, sql: str) -> None:
    """Raise ValueError unless ``sql`` is a single read-only statement.

    Two layers: (1) textual first-keyword gate, (2) for query-shaped
    statements, parse with ``sessionState().sqlParser().parsePlan`` and
    reject if any plan node is a command/DDL/DML node — the fix for the
    ``WITH c AS (SELECT 1) INSERT OVERWRITE DIRECTORY ...`` bypass, which
    passes layer 1 but parses to an ``InsertIntoStatement`` root."""
    first = _first_keyword(sql)
    if first not in _QUERY_KEYWORDS + _META_KEYWORDS:
        raise ValueError(
            "read-only endpoint: only a single SELECT/WITH/VALUES/TABLE query "
            "or SHOW/DESCRIBE/EXPLAIN is allowed"
        )
    if first in _META_KEYWORDS:
        return  # metadata commands never write; EXPLAIN only plans
    try:
        jparser = spark._jsparkSession.sessionState().sqlParser()
    except Exception:
        # No JVM parser handle (Spark Connect). Fall back to the coarse
        # token denylist over the statement with string literals removed.
        if _DENY_TOKEN_RE.search(
            _STRING_LIT_RE.sub(" ", _COMMENT_RE.sub(" ", sql))
        ):
            raise ValueError(
                "read-only endpoint: statement contains a write/DDL keyword"
            ) from None
        return
    try:
        jplan = jparser.parsePlan(sql)
    except Exception as e:
        raise ValueError(f"parse error: {str(e)[:300]}") from None
    names: list = []
    _plan_node_names(jplan, names)
    denied = sorted({n for n in names if _DENY_NODE_RE.match(n)})
    if denied:
        raise ValueError(
            f"read-only endpoint: statement contains non-query plan node(s) "
            f"{denied}"
        )


def _json_default(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def run_sql(spark: SparkSession, sql: str, limit: int, max_rows: int) -> dict:
    """Execute read-only SQL with the row cap pushed into the plan."""
    _assert_read_only(spark, sql)
    n = max(1, min(limit or max_rows, max_rows))
    df = spark.sql(sql)
    rows = df.limit(n + 1).collect()
    truncated = len(rows) > n
    return {
        "columns": df.columns,
        "rows": [[r[c] for c in df.columns] for r in rows[:n]],
        "n_rows": min(len(rows), n),
        "truncated": truncated,
    }


def run_sql_arrow(spark: SparkSession, sql: str, limit: int, max_rows: int) -> bytes:
    """Execute read-only SQL and serialize the result as an **Arrow IPC
    stream** — the columnar wire format Spark Connect / ADBC / Flight
    clients speak, and the honest high-throughput twin of the JSON
    endpoint: the collect path is Arrow end to end (``df.toArrow``), so
    wide numeric dashboards never pay per-value JSON encoding. Row cap
    semantics match :func:`run_sql`; ``n_rows``/``truncated`` travel in
    the stream's schema metadata."""
    import io

    import pyarrow as pa

    _assert_read_only(spark, sql)
    n = max(1, min(limit or max_rows, max_rows))
    table = spark.sql(sql).limit(n + 1).toArrow()
    truncated = table.num_rows > n
    table = table.slice(0, n)
    table = table.replace_schema_metadata(
        {
            **(table.schema.metadata or {}),
            b"n_rows": str(table.num_rows).encode(),
            b"truncated": b"true" if truncated else b"false",
        }
    )
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue()


class _PartsViewRefresher:
    """Keeps parts-backed FINAL views CURRENT: before each query, re-resolve
    any registered parts table whose version log advanced since the view
    was last built (in ClickHouse a FINAL view is always current; a
    startup-pinned snapshot would hide later commits from dashboards).
    The staleness probe is one driver-side directory listing per table —
    metadata-only, no data scan; the view plan is rebuilt only on an
    actual version change."""

    def __init__(self, spark: SparkSession, views: dict[str, str]):
        self._spark = spark
        self._views = dict(views)
        self._built: dict[str, int] = {}
        self._lock = threading.Lock()
        self.refresh()  # fail loudly at startup on a bad path

    def refresh(self) -> None:
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
            current_version,
            read_parts,
        )

        with self._lock:
            for name, path in self._views.items():
                ver = current_version(path)
                if self._built.get(name) == ver:
                    continue
                read_parts(self._spark, path, final=True).createOrReplaceTempView(name)
                self._built[name] = ver


def make_server(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 0,
    max_rows: int = 10_000,
    parts_views: dict[str, str] | None = None,
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server bound to ``host:port``
    (port 0 = ephemeral, read the chosen one from ``server_port``).
    ``parts_views`` maps view name → parts-table path; each is served as
    a FINAL read re-resolved per query when the table's version advances."""
    refresher = _PartsViewRefresher(spark, parts_views) if parts_views else None

    def _is_stale_snapshot_error(e: Exception) -> bool:
        """A scan that raced a maintenance swap: the query plan resolved a
        parts version whose files a concurrent OPTIMIZE+VACUUM removed
        mid-execution (Spark surfaces FAILED_READ_FILE.FILE_NOT_EXIST).
        ClickHouse's part reference counting makes this impossible there;
        this layer's equivalent is re-resolve-and-retry."""
        msg = str(e)
        return (
            "FAILED_READ_FILE" in msg
            or "FILE_NOT_EXIST" in msg
            or "FileNotFoundException" in msg
        )

    def _with_snapshot_retry(fn):
        """Run ``fn``; on a stale-snapshot read, re-resolve the parts
        views and retry (twice — a retry can itself race the next swap).
        Analysis errors, bad SQL, and every other failure propagate
        unchanged on the first throw."""
        for attempt in range(3):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — filtered below
                if (
                    refresher is None
                    or attempt == 2
                    or not _is_stale_snapshot_error(e)
                ):
                    raise
                refresher.refresh()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, doc: dict) -> None:
            body = json.dumps(doc, default=_json_default).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/health":
                self._send(200, {"ok": True})
            elif self.path == "/tables":
                names = [t.name for t in spark.catalog.listTables()]
                self._send(200, {"tables": sorted(names)})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path not in ("/sql", "/sql.arrow"):
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                sql = req.get("sql", "")
                limit = int(req.get("limit") or 0)
                if refresher is not None:
                    refresher.refresh()
                if self.path == "/sql.arrow":
                    body = _with_snapshot_retry(
                        lambda: run_sql_arrow(spark, sql, limit, max_rows)
                    )
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "application/vnd.apache.arrow.stream"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._send(
                        200,
                        _with_snapshot_retry(
                            lambda: run_sql(spark, sql, limit, max_rows)
                        ),
                    )
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # analysis errors etc. -> client, not stderr
                self._send(400, {"error": type(e).__name__, "detail": str(e)[:500]})

        def log_message(self, *a):  # quiet: Spark owns stdout here
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(spark: SparkSession, **kw) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread (used by tests and notebooks)."""
    srv = make_server(spark, **kw)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t


def main() -> None:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
        register_views,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8808)
    ap.add_argument("--max-rows", type=int, default=10_000)
    ap.add_argument(
        "--parts",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="register a parts table's FINAL read as view NAME — the "
        "v_fact_event_latest posture: dashboards always see collapsed "
        "latest-state, never raw part rows; the view is re-resolved per "
        "query when the table's version log advances, so later commits "
        "and takedowns are visible without a restart (repeatable)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="kickhouse-bi-serve")
    register_views(spark, args.sf_dir)
    parts_views = dict(spec.split("=", 1) for spec in args.parts)
    srv = make_server(spark, args.host, args.port, args.max_rows, parts_views or None)
    print(json.dumps({"serving": f"http://{args.host}:{srv.server_port}", "sf": args.sf_dir}))
    srv.serve_forever()


if __name__ == "__main__":
    main()
