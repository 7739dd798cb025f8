"""Property tests for the parts-table engines: the collapsing engine's
pair-cancellation must be ASSOCIATIVE — any assignment of a well-formed
mutation history to parts, with any prefix physically merged, collapses
to the same final state a one-shot evaluation produces; aggregating
states must merge to the raw GROUP BY under any batch split."""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources import (
    parts as P,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


#: a well-formed history: per (key, version) one state row and maybe a
#: cancel; every row lands in one of up to 4 parts
_history = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=1, max_value=3),   # version
        st.booleans(),                           # cancelled?
        st.integers(min_value=0, max_value=3),   # part of the state row
        st.integers(min_value=0, max_value=3),   # part of the cancel row
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


@SLOW
@given(hist=_history, max_seq_frac=st.floats(min_value=0.0, max_value=1.0))
def test_collapsing_any_split_any_prefix_merge_is_one_shot(
    spark, hist, max_seq_frac
):
    rows_by_part: dict[int, list] = {}
    expected = set()
    for key, ver, cancelled, p_state, p_cancel in hist:
        payload = f"k{key}v{ver}"
        rows_by_part.setdefault(p_state, []).append((key, ver, 1, payload))
        if cancelled:
            rows_by_part.setdefault(p_cancel, []).append((key, ver, -1, payload))
        else:
            expected.add((key, ver, payload))

    tbl = tempfile.mkdtemp(prefix="kickhouse-prop-") + "/t"
    P.create_parts_table(
        tbl, engine="collapsing", key_cols=("k",), sign_col="sign", version_col="ver"
    )
    n_parts = 0
    for part in sorted(rows_by_part):
        P.insert_into_parts(
            spark.createDataFrame(
                rows_by_part[part], "k long, ver long, sign int, payload string"
            ),
            tbl,
        )
        n_parts += 1
    max_seq = max(1, int(round(max_seq_frac * n_parts)))
    P.optimize_parts(spark, tbl, max_seq=max_seq)

    def _final() -> set:
        # a fully-cancelled table may have optimized down to NO parts —
        # that IS the empty state
        try:
            df = P.read_parts(spark, tbl, final=True)
        except FileNotFoundError:
            return set()
        return {(r.k, r.ver, r.payload) for r in df.filter("sign = 1").collect()}

    assert _final() == expected
    # a FULL merge then the collapsed fast path agrees too
    P.optimize_parts(spark, tbl)
    assert _final() == expected


@SLOW
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # key
            st.integers(min_value=-100, max_value=100),  # value
            st.integers(min_value=0, max_value=2),     # batch
        ),
        min_size=1,
        max_size=15,
    )
)
def test_aggregating_any_batch_split_equals_group_by(spark, vals):
    spec = {"n": "sum", "total": "sum", "lo": "min", "hi": "max"}
    expected = {}
    for k, v, _ in vals:
        n, t, lo, hi = expected.get(k, (0, 0, None, None))
        expected[k] = (
            n + 1,
            t + v,
            v if lo is None else min(lo, v),
            v if hi is None else max(hi, v),
        )

    tbl = tempfile.mkdtemp(prefix="kickhouse-prop-") + "/t"
    P.create_parts_table(tbl, engine="aggregating", key_cols=("k",), agg_spec=spec)
    for b in sorted({b for _, _, b in vals}):
        batch = [(k, v) for k, v, bb in vals if bb == b]
        raw = spark.createDataFrame(batch, "k long, v long").selectExpr(
            "k", "1 AS n", "v AS total", "v AS lo", "v AS hi"
        )
        P.insert_into_parts(P.aggregate_states(raw, ("k",), spec), tbl)

    got = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in P.read_parts(spark, tbl, final=True).collect()
    }
    assert got == expected
