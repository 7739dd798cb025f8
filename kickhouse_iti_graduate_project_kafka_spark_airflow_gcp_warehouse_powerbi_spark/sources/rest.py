"""Paced REST API source (S7) — the producer-side ingestion surface.

The reference's producers poll TheSportsDB with per-endpoint rate limits,
retry/backoff on 429/404, and response-shape unwrapping (reference:
producers/common.py:64-97; pacer producers/event_producer.py:34-44; shape
unwrap producers/event_details_producer.py:57-67). In a Spark engine this
is a *driver-side* concern: fetch paced batches in plain Python, then hand
rows to the cluster with ``spark.createDataFrame`` (or join them in a
``foreachBatch``). Executors never make HTTP calls — API rate limits and
cluster parallelism must not meet.

No external HTTP library is assumed: ``transport`` is injectable (tests use
a fake); the default uses urllib from the standard library.
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class RateLimiter:
    """Token-pacing: at most ``per_minute`` calls/min (reference: 50 rpm
    event lookups, 150 rpm details, 30 rpm players)."""

    def __init__(self, per_minute: float, clock=time.monotonic, sleep=time.sleep):
        self.interval = 60.0 / per_minute
        self._clock = clock
        self._sleep = sleep
        self._next_ok = clock()

    def wait(self) -> None:
        now = self._clock()
        if now < self._next_ok:
            self._sleep(self._next_ok - now)
        self._next_ok = max(now, self._next_ok) + self.interval


def default_transport(url: str, timeout: float = 10.0) -> tuple[int, str]:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.status, resp.read().decode("utf-8")


def fetch_json(
    url: str,
    transport: Callable[[str], tuple[int, str]] = default_transport,
    retries: int = 3,
    backoff_s: float = 1.0,
    sleep=time.sleep,
) -> dict | list | None:
    """GET with retry/backoff on 429/5xx and None on 404 (reference:
    producers/common.py:64-97 semantics)."""
    delay = backoff_s
    for attempt in range(retries + 1):
        status, body = transport(url)
        if status == 404:
            return None
        if status == 429 or status >= 500:
            if attempt == retries:
                raise RuntimeError(f"GET {url} failed with {status} after {retries} retries")
            sleep(delay)
            delay *= 2
            continue
        return json.loads(body)
    return None


def unwrap_rows(payload: dict | list | None, keys: Iterable[str] = ("events", "results", "list")) -> list[dict]:
    """Response-shape unwrapper: APIs wrap row arrays under varying keys or
    return a bare array (reference: _arr, event_details_producer.py:57-67)."""
    if payload is None:
        return []
    if isinstance(payload, list):
        return [r for r in payload if isinstance(r, dict)]
    for k in keys:
        v = payload.get(k)
        if isinstance(v, list):
            return [r for r in v if isinstance(r, dict)]
    return []


def rest_batch_to_df(
    spark: SparkSession,
    urls: Iterable[str],
    schema: T.StructType,
    transport: Callable[[str], tuple[int, str]] = default_transport,
    per_minute: float = 60.0,
    clock=time.monotonic,
    sleep=time.sleep,
) -> DataFrame:
    """Fetch a paced batch of endpoints and return one DataFrame.

    Driver-side loop by design (see module docstring); rows parse through
    the explicit entity schema so unknown keys drop exactly as the Kafka
    path's from_json does."""
    limiter = RateLimiter(per_minute, clock=clock, sleep=sleep)
    names = {f.name for f in schema.fields}
    rows = []
    for url in urls:
        limiter.wait()
        for doc in unwrap_rows(fetch_json(url, transport=transport, sleep=sleep)):
            rows.append({k: v for k, v in doc.items() if k in names})
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
