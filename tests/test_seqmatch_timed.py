"""Time-constrained sequenceMatch (operators/seqmatch.py).

Hand cases pin the semantics the greedy scan gets wrong; a brute-force
all-subsequences reference proves the monotone DP exact on seeded random
streams (ties included); the generated window-function oracle SQL is
cross-checked in DuckDB on the same streams.
"""

from __future__ import annotations

import datetime
import itertools
import random

import duckdb
import pandas as pd
import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.seqmatch import (
    sequence_match_timed,
    sequence_match_timed_oracle_sql,
)

SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _ev(spark, rows):
    data = [
        (u, datetime.datetime.fromtimestamp(t, datetime.timezone.utc).replace(tzinfo=None), et, i)
        for (u, t, et, i) in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def _matched(spark, rows, steps, gaps):
    df = sequence_match_timed(_ev(spark, rows), steps, gaps)
    return {r.user_id: r.matched for r in df.collect()}


def _brute(rows, steps, gaps):
    """Exact existence over all index subsequences, per user."""
    out = {}
    users = {u for (u, *_r) in rows}
    for u in users:
        seq = sorted((t, i, et) for (uu, t, et, i) in rows if uu == u and et in steps)
        if not seq:  # DP only emits users with >=1 step-typed event
            continue
        hit = 0
        for combo in itertools.combinations(range(len(seq)), len(steps)):
            if any(seq[p][2] != steps[j] for j, p in enumerate(combo)):
                continue
            ok = True
            for j, g in enumerate(gaps):
                if g is None:
                    continue
                gap = seq[combo[j + 1]][0] - seq[combo[j]][0]
                ok = ok and (gap <= g[1] if g[0] == "<=" else gap > g[1])
            if ok:
                hit = 1
                break
        out[u] = hit
    return out


def test_greedy_incompleteness_case(spark):
    # earliest view (t=0) is too old for the only signup (t=5000) under
    # a 3600s bound; the later view (t=4000) works — greedy would say 0.
    rows = [(1, 0, "view", 1), (1, 4000, "view", 2), (1, 5000, "signup", 3),
            (1, 5100, "purchase", 4)]
    assert _matched(
        spark, rows, ("view", "signup", "purchase"), (("<=", 3600), ("<=", 3600))
    ) == {1: 1}


def test_upper_bound_rejects_wide_gap(spark):
    rows = [(1, 0, "view", 1), (1, 5000, "signup", 2), (1, 5100, "purchase", 3)]
    assert _matched(
        spark, rows, ("view", "signup", "purchase"), (("<=", 3600), ("<=", 3600))
    ) == {1: 0}


def test_lower_bound_needs_early_completion(spark):
    # purchase must come >600s after a qualifying signup: the EARLY
    # signup (t=100) clears it, the late one (t=900) would not — a
    # keep-latest carry would wrongly say 0.
    rows = [(1, 0, "view", 1), (1, 100, "signup", 2), (1, 900, "signup", 3),
            (1, 1000, "purchase", 4)]
    assert _matched(
        spark, rows, ("view", "signup", "purchase"), (("<=", 3600), (">", 600))
    ) == {1: 1}
    # only the late signup: gap 100 is not > 600
    rows = [(1, 0, "view", 1), (1, 900, "signup", 2), (1, 1000, "purchase", 3)]
    assert _matched(
        spark, rows, ("view", "signup", "purchase"), (("<=", 3600), (">", 600))
    ) == {1: 0}


def test_tie_gap_zero_satisfies_upper_bound(spark):
    rows = [(1, 5, "view", 1), (1, 5, "signup", 2), (1, 6, "purchase", 3)]
    assert _matched(
        spark, rows, ("view", "signup", "purchase"), (("<=", 3600), ("<=", 3600))
    ) == {1: 1}


@pytest.mark.parametrize(
    "gaps",
    [
        (("<=", 60), ("<=", 60)),
        ((">", 30), ("<=", 90)),
        (("<=", 90), (">", 30)),
        (None, (">", 45)),
    ],
)
def test_dp_matches_bruteforce_and_duckdb(spark, gaps):
    steps = ("view", "signup", "purchase")
    rng = random.Random(1107)
    rows, eid = [], 0
    for u in range(15):
        for _ in range(rng.randint(0, 25)):
            eid += 1
            rows.append(
                (u, rng.randint(0, 200),
                 rng.choice(["view", "signup", "purchase", "click"]), eid)
            )
    got = _matched(spark, rows, steps, gaps)
    want = _brute(rows, steps, gaps)
    assert got == want

    pdf = pd.DataFrame(
        [(u, pd.Timestamp(t, unit="s"), et, i) for (u, t, et, i) in rows],
        columns=["user_id", "ts", "event_type", "event_id"],
    )
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        n_users, n_matched = con.execute(
            sequence_match_timed_oracle_sql(steps, gaps)
        ).fetchone()
    finally:
        con.close()
    assert n_users == len(got)
    assert n_matched == sum(got.values())


def test_rejects_bad_specs(spark):
    ev = _ev(spark, [(1, 1, "view", 1)])
    with pytest.raises(ValueError):
        sequence_match_timed(ev, ("view",), ())
    with pytest.raises(ValueError):
        sequence_match_timed(ev, ("view", "signup"), ())
    with pytest.raises(ValueError):
        sequence_match_timed(ev, ("view", "signup"), (("<", 5),))
