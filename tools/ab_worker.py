#!/usr/bin/env python
"""Treatment worker for ``bench.py --interleave`` (r10 verdict #4).

One worker per treatment (a repo checkout — the current tree or a git
worktree of an older ref). The parent process alternates timing requests
between the two workers so every (A, B) sample pair lands seconds apart
inside the SAME ambient host window — the paired design that the
fixed-work calibration probe could not deliver (r10: the probe moved
−11% while the suite moved +34% on identical code).

Protocol (one JSON object per line, stdin -> stdout):

    {"op": "warm", "name": q}   -> {"name": q, "rows": N, "secs": s}
    {"op": "time", "name": q}   -> {"name": q, "secs": s}
    {"op": "quit"}              -> (exits)

Timing semantics mirror bench.py exactly: each "time" is a cold repeat
(operator caches cleared first) covering fn() construction plus a full
materialization — driver collect for small results, noop-sink write for
>100k-row results so row serialization doesn't dominate. Errors are
reported as {"name": q, "error": "..."} so one missing query in an old
ref doesn't kill the comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    repo, sf_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)

    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (  # noqa: E501
        get_spark,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (  # noqa: E501
        load_all,
    )

    spark = get_spark(app_name=f"kickhouse-ab-{os.path.basename(repo.rstrip('/'))}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def _clear_caches() -> None:
        # same cold-cache contract as bench.py; getattr-guarded so the
        # worker also drives older refs whose cache surface differs
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators import (  # noqa: E501
            bm25 as _bm25,
        )
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators import (  # noqa: E501
            dedup as _dedup,
        )
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans import (  # noqa: E501
            curation as _curation,
        )

        for mod, fn in (
            (_curation, "clear_component_cache"),
            (_dedup, "clear_all_caches"),
            (_bm25, "clear_postings_cache"),
        ):
            f = getattr(mod, fn, None)
            if f is not None:
                f()

    big_output: dict[str, bool] = {}

    print(json.dumps({"ready": True, "repo": repo}), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        if req["op"] == "quit":
            break
        name = req["name"]
        spec = registry.get(name)
        if spec is None:
            print(json.dumps({"name": name, "error": "not in registry"}), flush=True)
            continue
        try:
            if req["op"] == "warm":
                t0 = time.perf_counter()
                n = spec.fn(spark, sf_dir).count()
                big_output[name] = n > 100_000
                print(
                    json.dumps(
                        {"name": name, "rows": n,
                         "secs": round(time.perf_counter() - t0, 3)}
                    ),
                    flush=True,
                )
            else:  # "time"
                _clear_caches()
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                if big_output.get(name):
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                print(
                    json.dumps(
                        {"name": name, "secs": round(time.perf_counter() - t0, 3)}
                    ),
                    flush=True,
                )
        except Exception as exc:  # noqa: BLE001 — report, keep serving
            print(
                json.dumps({"name": name, "error": f"{type(exc).__name__}: {exc}"[:300]}),
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
