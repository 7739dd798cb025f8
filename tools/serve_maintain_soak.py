#!/usr/bin/env python
"""Concurrent serve + maintain soak (r11 verdict #8).

serve_bi has an 8-way concurrent-refresh smoke and the streaming layer
has kill-injection soaks, but never SIMULTANEOUSLY: this drives BI
queries against a parts-backed FINAL view while the SAME table is being
mutated and compacted underneath it — inserts advancing the version
log, ``maintain_parts`` running OPTIMIZE prefix-merges and VACUUM
dropping old versions mid-flight. The reader-vs-swap race is the
classic serving bug this architecture invites (a dashboard reads
version v while the maintainer merges v's parts away).

Assertion model (linearizability against the version log):

- the writer records, for EVERY committed version, the quiesced answer
  of a content fingerprint query (COUNT + BIT_XOR of XXHASH64 over all
  columns) computed via ``read_parts(final=True, version=v)``;
- reader threads hammer ``POST /sql`` with the IDENTICAL fingerprint
  query against the served view for the whole run;
- afterwards, every served response must equal the quiesced answer of
  SOME committed version (no torn reads, no partial part lists), no
  request may error (no FileNotFound from a vacuum sweeping a version
  out from under a running scan), and each reader's matched version
  sequence must be NON-DECREASING (the refresher may only move
  forward);
- OPTIMIZE must be answer-preserving: the quiesced fingerprint after a
  merge-only commit equals the one before it.

Writes ``sweeps/serve_maintain_soak_<tag>.json`` and prints one JSON
summary line.

Usage:
    python tools/serve_maintain_soak.py --inserts 40 --readers 4 \
        --maintain-every 4 --keep-versions 3 --tag r12
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FP_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(COALESCE(BIT_XOR(XXHASH64(CAST(k AS STRING), "
    "CAST(ver AS STRING), CAST(val AS STRING))), 0) AS BIGINT) AS fp "
    "FROM {table}"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inserts", type=int, default=40)
    ap.add_argument("--readers", type=int, default=4)
    ap.add_argument("--maintain-every", type=int, default=4)
    ap.add_argument("--max-parts", type=int, default=4)
    ap.add_argument("--keep-versions", type=int, default=3)
    ap.add_argument("--keys", type=int, default=500)
    ap.add_argument("--tag", default="r12")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jobs.serve_bi import serve_background
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        create_parts_table,
        current_version,
        insert_into_parts,
        maintain_parts,
        read_parts,
    )

    spark = get_spark(app_name="serve-maintain-soak", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="kickhouse-serve-soak-")
    path = os.path.join(root, "live_state")
    create_parts_table(
        path, engine="replacing", key_cols=["k"], version_col="ver"
    )

    def batch(i: int):
        # rotate updates over a key window plus fresh inserts — every
        # version has a distinct FINAL fingerprint
        lo = (i * 37) % args.keys
        rows = [(int(k), int(i), float(k) * 1.5 + i) for k in range(lo, lo + 60)]
        rows += [(args.keys + i, int(i), float(i))]
        return spark.createDataFrame(rows, "k long, ver long, val double")

    expected: dict[tuple[int, int], int] = {}  # (n, fp) -> first version
    by_version: dict[int, tuple[int, int]] = {}

    def record_expected() -> int:
        ver = current_version(path)
        read_parts(spark, path, final=True, version=ver).createOrReplaceTempView(
            "_soak_quiesced"
        )
        row = spark.sql(FP_SQL.format(table="_soak_quiesced")).first()
        key = (row["n"], row["fp"])
        expected.setdefault(key, ver)
        by_version[ver] = key
        return ver

    insert_into_parts(batch(0), path)  # seed so the view resolves
    record_expected()

    srv, _ = serve_background(
        spark, port=0, max_rows=100, parts_views={"live_state": path}
    )
    base = f"http://127.0.0.1:{srv.server_port}"
    stop = threading.Event()
    reader_logs: list[list] = [[] for _ in range(args.readers)]
    reader_errors: list = []

    def reader(idx: int) -> None:
        body = json.dumps({"sql": FP_SQL.format(table="live_state")}).encode()
        while not stop.is_set():
            req = urllib.request.Request(
                base + "/sql", data=body,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    doc = json.loads(r.read())
                n, fp = doc["rows"][0]
                reader_logs[idx].append((int(n), int(fp)))
            except urllib.error.HTTPError as e:
                detail = e.read().decode(errors="replace")[:400]
                reader_errors.append((idx, f"HTTP {e.code}", detail))
                return
            except Exception as e:  # noqa: BLE001 — any error is a finding
                reader_errors.append((idx, type(e).__name__, str(e)[:300]))
                return

    threads = [
        threading.Thread(target=reader, args=(i,), daemon=True)
        for i in range(args.readers)
    ]
    for t in threads:
        t.start()

    n_maintain = 0
    n_optimized = 0
    merge_preserving_failures = []
    t0 = time.perf_counter()
    for i in range(1, args.inserts + 1):
        insert_into_parts(batch(i), path)
        record_expected()
        if i % args.maintain_every == 0:
            before = by_version[current_version(path)]
            res = maintain_parts(
                spark, path,
                max_parts=args.max_parts,
                keep_versions=args.keep_versions,
            )
            n_maintain += 1
            if res.get("optimized"):
                n_optimized += 1
                after_ver = record_expected()
                if by_version[after_ver] != before:
                    merge_preserving_failures.append(
                        {"version": after_ver, "before": before,
                         "after": by_version[after_ver]}
                    )
    wall = round(time.perf_counter() - t0, 2)

    time.sleep(1.0)  # let readers observe the final state
    stop.set()
    for t in threads:
        t.join(timeout=150)
    srv.shutdown()

    # ---- verdict ----
    unmatched = []
    non_monotonic = []
    n_requests = 0
    for idx, log in enumerate(reader_logs):
        last_ver = -1
        for n, fp in log:
            n_requests += 1
            ver = expected.get((n, fp))
            if ver is None:
                unmatched.append({"reader": idx, "n": n, "fp": fp})
            else:
                if ver < last_ver:
                    non_monotonic.append(
                        {"reader": idx, "saw": ver, "after": last_ver}
                    )
                last_ver = max(last_ver, ver)

    out = {
        "tag": args.tag,
        "inserts": args.inserts,
        "readers": args.readers,
        "maintain_calls": n_maintain,
        "optimize_commits": n_optimized,
        "keep_versions": args.keep_versions,
        "versions_committed": len(by_version),
        "served_requests": n_requests,
        "reader_errors": reader_errors,
        "unmatched_responses": unmatched,
        "non_monotonic_responses": non_monotonic,
        "merge_preserving_failures": merge_preserving_failures,
        "writer_wall_secs": wall,
        "ok": not (
            reader_errors
            or unmatched
            or non_monotonic
            or merge_preserving_failures
        )
        and n_requests > 0
        and n_optimized > 0,
    }
    shutil.rmtree(root, ignore_errors=True)
    dst = os.path.join(REPO, "sweeps", f"serve_maintain_soak_{args.tag}.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
