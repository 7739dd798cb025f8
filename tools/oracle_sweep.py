#!/usr/bin/env python
"""Full-catalog DuckDB-oracle sweep at an arbitrary fixture scale.

Every correctness comparison the driver records runs at sf0.01; this tool
re-runs the SAME compare (rows + columns + value hash, via
``testing.compare_query``) for every oracled catalog query against any
fixture — in particular the 10x sf1 ladder fixture
(``tools/gen_sf1.py`` -> ``.benchdata/sf1``). Size-dependent failure
modes (broadcast-threshold flips, sampling paths, windowed-sum overflow,
span clamps) are exactly what the sf0.01 gate cannot see; the r9 full
non-UTC sweep precedent says widened sweeps find real dormant bugs.

Skips:
- a static list of oracles that are quadratic BY DESIGN (the exact
  all-pairs replays whose cost at sf1 is ~100x their measured ~830 s at
  sf0.1 — their oracled invariant companions carry them, as recorded in
  VERDICT r8/r9);
- any oracle that exceeds ``--timeout-secs`` wall clock (DuckDB is
  interrupted from a watchdog thread) — recorded as ``timeout``, never
  silently dropped.

Writes one JSON artifact (default ``sweeps/sweep_<tag>.json``) with a
per-query record {status, rows, secs_spark, secs_oracle, detail} and a
summary block, and exits non-zero on any mismatch.

Usage:
    python tools/oracle_sweep.py --sf-dir .benchdata/sf1 --tag r10_sf1
    python tools/oracle_sweep.py --only q1,q2 --timeout-secs 120
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Oracles infeasible at 10x by construction (exact all-pairs replays).
#: Since r11 each one ALSO has a direct ``*_sampled`` companion in the
#: catalog (same operator + same oracle SQL rewritten onto a
#: deterministic 4% md5-bucket sample — plans/curation.sampled_oracle)
#: that runs un-skipped in this sweep, so at-scale correctness no longer
#: rides invariant companions alone.
QUADRATIC_ORACLES = {
    "docs_ngram_jaccard_pairs": "exact all-pairs jaccard oracle, ~830 s at sf0.1 (BASELINE.md); direct sampled companion docs_ngram_jaccard_pairs_sampled runs in this sweep",
    "docs_minhash_lsh_pairs": "same exact all-pairs jaccard base CTE as docs_ngram_jaccard_pairs; direct sampled companion docs_minhash_lsh_pairs_sampled runs in this sweep",
    "docs_dup_clusters": "cluster oracle built on the same all-pairs jaccard CTE (confirmed >600 s at sf1 in the r10 sweep); direct sampled companion docs_dup_clusters_sampled runs in this sweep",
    "docs_dedup_survivors": "survivor oracle built on the same all-pairs jaccard CTE (confirmed >600 s at sf1 in the r10 sweep); direct sampled companion docs_dedup_survivors_sampled runs in this sweep",
    "docs_incremental_ingest": "oracle is an explicit odd-half x even-half all-pairs jaccard cross join (confirmed >600 s at sf1 in the r10 sweep); direct sampled companion docs_incremental_ingest_sampled runs in this sweep",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".benchdata", "sf1"))
    ap.add_argument("--tag", default="sweep")
    ap.add_argument("--timeout-secs", type=float, default=600.0)
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--skip", default="", help="extra names to skip")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        testing,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (
        load_all,
    )

    registry = load_all()
    only = {n for n in args.only.split(",") if n}
    extra_skip = {n for n in args.skip.split(",") if n}
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        # honor the same scale knob as session.py: a fixed 32 at sf100
        # means GB-scale shuffle blocks and 32 concurrent sort buffers
        # (the r12 ladder OOM'd a 72 g heap exactly this way); AQE
        # coalesces small shuffles back down, so raising it only
        # changes oversized partitions
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"),
        )
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "48g"))
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_IO_CODEC", "lz4"),
        )
        # shuffle files are only deleted when driver GC collects the
        # shuffle dependency; the 30 min default let dead shuffle files
        # fill the disk mid-sweep at sf100 (see BASELINE.md r12 ladder)
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
        .appName("kickhouse-oracle-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    t_suite = time.perf_counter()
    names = [
        n for n, s in registry.items() if s.oracle is not None and (not only or n in only)
    ]
    for i, name in enumerate(sorted(names)):
        spec = registry[name]
        if name in QUADRATIC_ORACLES and not only:
            results[name] = {"status": "skipped_quadratic", "detail": QUADRATIC_ORACLES[name]}
            continue
        if name in extra_skip:
            results[name] = {"status": "skipped_cli", "detail": "--skip"}
            continue
        rec: dict = {}
        try:
            # The Spark side gets the same wall-clock budget as the
            # oracle: one pathological query at a new scale must record
            # a 'timeout' row, not hang the whole sweep. cancelAllJobs
            # from a timer aborts the collect with a job-cancelled error.
            s_timed_out = threading.Event()

            def spark_watchdog():
                s_timed_out.set()
                spark.sparkContext.cancelAllJobs()

            s_timer = threading.Timer(args.timeout_secs, spark_watchdog)
            s_timer.start()
            try:
                t0 = time.perf_counter()
                sdf = spec.fn(spark, args.sf_dir)
                s_cols = list(sdf.columns)
                s_rows = [tuple(r) for r in sdf.collect()]
                rec["secs_spark"] = round(time.perf_counter() - t0, 3)
            except Exception:
                if s_timed_out.is_set():
                    rec.update(
                        status="timeout",
                        detail=f"spark side exceeded {args.timeout_secs}s",
                    )
                    results[name] = rec
                    print(f"[{i+1}/{len(names)}] {name}: TIMEOUT (spark)", flush=True)
                    continue
                raise
            finally:
                s_timer.cancel()

            con = testing.duckdb_connection(args.sf_dir)
            timed_out = threading.Event()

            def watchdog():
                timed_out.set()
                con.interrupt()

            timer = threading.Timer(args.timeout_secs, watchdog)
            timer.start()
            try:
                t1 = time.perf_counter()
                cur = con.execute(spec.oracle)
                o_cols = [d[0] for d in cur.description]
                o_rows = cur.fetchall()
                rec["secs_oracle"] = round(time.perf_counter() - t1, 3)
            except Exception:
                if timed_out.is_set():
                    rec.update(
                        status="timeout",
                        detail=f"oracle exceeded {args.timeout_secs}s",
                    )
                    results[name] = rec
                    print(f"[{i+1}/{len(names)}] {name}: TIMEOUT", flush=True)
                    continue
                raise
            finally:
                timer.cancel()
                con.close()

            row_match = len(s_rows) == len(o_rows)
            col_match = sorted(s_cols) == sorted(o_cols)
            val_match = False
            detail = ""
            if row_match and col_match:
                sc = testing._rows_to_canon(s_cols, s_rows)
                oc = testing._rows_to_canon(o_cols, o_rows)
                val_match = sc == oc
                if not val_match:
                    diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
                    detail = f"{len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}"
            else:
                detail = f"rows {len(s_rows)} vs {len(o_rows)}; spark_cols={sorted(s_cols)} oracle_cols={sorted(o_cols)}"
            ok = row_match and col_match and val_match
            rec.update(
                status="ok" if ok else "MISMATCH",
                rows=len(s_rows),
                detail=detail[:400],
            )
        except Exception as e:  # noqa: BLE001 — sweep must record, not die
            rec.update(status="error", detail=f"{type(e).__name__}: {e}"[:400])
            traceback.print_exc()
        results[name] = rec
        print(
            f"[{i+1}/{len(names)}] {name}: {rec['status']} "
            f"spark={rec.get('secs_spark', '-')}s oracle={rec.get('secs_oracle', '-')}s",
            flush=True,
        )
        # Reclaim the finished query's shuffle files before the next one:
        # ContextCleaner only deletes them on driver GC, and a 200+-query
        # sweep at a big fixture otherwise accumulates every query's
        # shuffle output on local disk (the r12 sf100 bench run filled
        # the disk exactly this way).
        import gc as _gc

        s_rows = None
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        # incremental flush: a killed/cut-short sweep still leaves a
        # readable partial artifact (long at-scale runs can exceed a
        # session; the final write below overwrites with the summary)
        _partial = args.out or os.path.join(REPO, "sweeps", f"sweep_{args.tag}.json")
        os.makedirs(os.path.dirname(_partial), exist_ok=True)
        with open(_partial + ".partial", "w") as f:
            json.dump({"summary": {"partial": True, "done": i + 1,
                                   "of": len(names), "sf_dir": args.sf_dir},
                       "queries": results}, f, indent=1, sort_keys=True)

    statuses = [r["status"] for r in results.values()]
    summary = {
        "sf_dir": args.sf_dir,
        "total_oracled": len(results),
        "ok": statuses.count("ok"),
        "mismatch": statuses.count("MISMATCH"),
        "error": statuses.count("error"),
        "timeout": statuses.count("timeout"),
        "skipped_quadratic": statuses.count("skipped_quadratic"),
        "skipped_cli": statuses.count("skipped_cli"),
        "suite_secs": round(time.perf_counter() - t_suite, 1),
    }
    out_path = args.out or os.path.join(REPO, "sweeps", f"sweep_{args.tag}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    bad = summary["mismatch"] + summary["error"]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
