"""Largest-Triangle-Three-Buckets downsampling — ClickHouse
``largestTriangleThreeBuckets(n)(x, y)``.

The reference's dashboards draw hourly series straight from ClickHouse
(reference: grafana/dashboards/*.json time-series panels); at 100 TB a
panel cannot pull a million raw points, and LTTB (Steinarsson's
published visual-downsampling algorithm, the one ClickHouse ships) is
the standard answer: keep the first and last point, split the middle
into ``n_out - 2`` equal-count buckets, and walking left to right pick
from each bucket the point forming the LARGEST TRIANGLE with the
previously selected point and the average of the NEXT bucket.

Cross-engine determinism is the hard part: the canonical algorithm
compares float triangle areas built from a float bucket average. This
implementation requires integer ``x``/``y`` (hour buckets, counts —
what a dashboard series is) and compares areas scaled by the next
bucket's point count, so every candidate score is an exact BIGINT:

    score(p) = | (px*c - Sx) * (p.y - py)  -  (px - p.x) * (Sy - py*c) |

with ``(Sx, Sy, c)`` the next bucket's coordinate sums (the last point
with ``c = 1`` for the final bucket) and ``(px, py)`` the previous
selection. Ties keep the smallest ``x``. Exact as long as
``|Δx| * c * |Δy| < 2^63`` — loudly out of range otherwise, never
silently wrong. Equal scores therefore resolve identically in Spark
and any SQL oracle.

Spark-first shape: bucket membership and next-bucket anchors are plain
window/group-by algebra; the sequential "previous selection feeds the
next bucket" chain is ONE ``F.aggregate`` fold per series over the
array of bucket summaries (a nested fold computes each bucket's argmax
— still zero Python in the row path). Per-series state is ``n_out``
structs, NOT the raw points, so a series only ever materializes its
own bucket arrays — the same per-group arena ClickHouse uses. Series
with ``n <= n_out`` points pass through unchanged (the published
contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .cachereg import track as _persist


def _score(px: Column, py: Column, bk, p) -> Column:
    """Exact integer triangle score of candidate ``p`` against the
    previous selection and ``bk``'s next-bucket anchor sums."""
    return F.abs(
        (px * bk["nc"] - bk["nsx"]) * (p["y"] - py)
        - (px - p["x"]) * (bk["nsy"] - py * bk["nc"])
    )


def lttb(
    df: DataFrame,
    series_col: str,
    x_col: str,
    y_col: str,
    n_out: int,
) -> DataFrame:
    """Downsample each series to ``n_out`` points -> (series, x, y).

    ``x`` must be unique within a series (raises at execution
    otherwise — a duplicated coordinate means the caller skipped the
    aggregation step, and a silent arbitrary pick would differ between
    engines). ``x``/``y`` are cast to BIGINT.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    b_count = n_out - 2
    ws = Window.partitionBy("s").orderBy("x")
    dup = F.count(F.lit(1)).over(Window.partitionBy("s", "x"))
    pts = (
        df.select(
            F.col(series_col).alias("s"),
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
        )
        .withColumn(
            "x",
            F.when(
                dup > 1,
                F.raise_error(
                    F.concat(
                        F.lit("lttb: duplicate x coordinate in series "),
                        F.col("s").cast("string"),
                    )
                ),
            ).otherwise(F.col("x")),
        )
        .withColumn("pos", F.row_number().over(ws))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("s")))
    )
    # pts fans out into five branches (small/mid/first/last/ends) that
    # the final union re-reads; without a persist each branch recomputes
    # the caller's upstream aggregation — for the catalog query that is
    # five full scans+aggregates of the fact table for a few hundred
    # post-aggregate rows (guide §5: reuse × recompute-cost). Registered
    # persist, released by the session's release_tracked sweep.
    pts = _persist(pts)
    small = pts.filter(F.col("n") <= n_out).select("s", "x", "y")
    big = pts.filter(F.col("n") > n_out)

    mid = big.filter((F.col("pos") > 1) & (F.col("pos") < F.col("n"))).withColumn(
        "b", F.expr(f"((pos - 2) * {b_count}) div (n - 2)")
    )
    last = big.filter(F.col("pos") == F.col("n")).select(
        "s", F.col("x").alias("lx"), F.col("y").alias("ly")
    )
    first = big.filter(F.col("pos") == 1).select(
        "s", F.col("x").alias("fx"), F.col("y").alias("fy")
    )
    wb = Window.partitionBy("s").orderBy("b")
    bags = (
        mid.groupBy("s", "b")
        .agg(
            F.sort_array(F.collect_list(F.struct("x", "y"))).alias("pts"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.count(F.lit(1)).alias("c"),
        )
        .join(last, "s")
        .select(
            "s",
            F.struct(
                F.col("b").alias("b"),
                F.col("pts").alias("pts"),
                F.coalesce(F.lead("sx").over(wb), F.col("lx")).alias("nsx"),
                F.coalesce(F.lead("sy").over(wb), F.col("ly")).alias("nsy"),
                F.coalesce(F.lead("c").over(wb), F.lit(1).cast("long")).alias("nc"),
            ).alias("bk"),
        )
    )
    per_series = (
        bags.groupBy("s")
        .agg(F.sort_array(F.collect_list("bk")).alias("buckets"))
        .join(first, "s")
    )

    def step(acc, bk):
        best = F.aggregate(
            bk["pts"],
            F.struct(
                F.lit(-1).cast("long").alias("a"),
                F.lit(0).cast("long").alias("bx"),
                F.lit(0).cast("long").alias("by"),
            ),
            lambda st, p: F.when(
                _score(acc["px"], acc["py"], bk, p) > st["a"],
                F.struct(
                    _score(acc["px"], acc["py"], bk, p).alias("a"),
                    p["x"].alias("bx"),
                    p["y"].alias("by"),
                ),
            ).otherwise(st),
        )
        return F.struct(
            best["bx"].alias("px"),
            best["by"].alias("py"),
            F.concat(
                acc["out"],
                F.array(F.struct(best["bx"].alias("x"), best["by"].alias("y"))),
            ).alias("out"),
        )

    folded = F.aggregate(
        F.col("buckets"),
        F.struct(
            F.col("fx").alias("px"),
            F.col("fy").alias("py"),
            F.expr("CAST(array() AS array<struct<x: bigint, y: bigint>>)").alias("out"),
        ),
        step,
    )
    middles = per_series.select("s", F.explode(folded["out"]).alias("p")).select(
        "s", F.col("p.x").alias("x"), F.col("p.y").alias("y")
    )
    ends = big.filter((F.col("pos") == 1) | (F.col("pos") == F.col("n"))).select(
        "s", "x", "y"
    )
    return small.unionByName(ends).unionByName(middles)


def lttb_oracle_sql(
    n_out: int,
    *,
    base_sql: str,
    series_alias: str,
) -> str:
    """The SAME selection as a DuckDB recursive CTE over ``base_sql``
    (which must yield columns ``s, x, y`` with BIGINT x/y, unique x per
    s). One recursion step per middle point: the state carries the
    previous selection and the current bucket's running argmax; the
    bucket's last point commits the selection. Returns
    (series_alias, x, y) rows."""
    b = n_out - 2
    _A = (
        "ABS((s2.px * m.nc - m.nsx) * (m.y - s2.py)"
        " - (s2.px - m.x) * (m.nsy - s2.py * m.nc))"
    )
    return f"""
    WITH RECURSIVE base AS ({base_sql}),
    pts AS (
        SELECT s, x, y,
               ROW_NUMBER() OVER (PARTITION BY s ORDER BY x) AS pos,
               COUNT(*) OVER (PARTITION BY s) AS n
        FROM base
    ),
    small AS (SELECT s, x, y FROM pts WHERE n <= {n_out}),
    big AS (SELECT * FROM pts WHERE n > {n_out}),
    mid AS (
        SELECT s, x, y, ((pos - 2) * {b}) // (n - 2) AS b
        FROM big WHERE pos > 1 AND pos < n
    ),
    lastp AS (SELECT s, x AS lx, y AS ly FROM big WHERE pos = n),
    firstp AS (SELECT s, x AS fx, y AS fy FROM big WHERE pos = 1),
    bstat AS (
        SELECT s, b, SUM(x) AS sx, SUM(y) AS sy, COUNT(*) AS c
        FROM mid GROUP BY s, b
    ),
    banchor AS (
        SELECT bs.s, bs.b,
               COALESCE(LEAD(bs.sx) OVER w, l.lx) AS nsx,
               COALESCE(LEAD(bs.sy) OVER w, l.ly) AS nsy,
               COALESCE(LEAD(bs.c)  OVER w, 1)    AS nc
        FROM bstat bs JOIN lastp l ON l.s = bs.s
        WINDOW w AS (PARTITION BY bs.s ORDER BY bs.b)
    ),
    mord AS (
        SELECT m.s, m.x, m.y, a.nsx, a.nsy, a.nc,
               ROW_NUMBER() OVER (PARTITION BY m.s ORDER BY m.b, m.x) AS i,
               COUNT(*)    OVER (PARTITION BY m.s) AS mtot,
               COALESCE(LEAD(m.b) OVER (PARTITION BY m.s ORDER BY m.b, m.x)
                        <> m.b, TRUE) AS lastb
        FROM mid m JOIN banchor a ON a.s = m.s AND a.b = m.b
    ),
    st AS (
        SELECT f.s, 0 AS i, t.mtot,
               f.fx AS px, f.fy AS py,
               CAST(-1 AS BIGINT) AS ba,
               CAST(0 AS BIGINT) AS bx, CAST(0 AS BIGINT) AS byy,
               FALSE AS emit,
               CAST(0 AS BIGINT) AS sel_x, CAST(0 AS BIGINT) AS sel_y
        FROM firstp f
        JOIN (SELECT s, COUNT(*) AS mtot FROM mid GROUP BY s) t ON t.s = f.s
        UNION ALL
        SELECT s2.s, s2.i + 1, s2.mtot,
               CASE WHEN m.lastb THEN (CASE WHEN {_A} > s2.ba THEN m.x ELSE s2.bx END)
                    ELSE s2.px END,
               CASE WHEN m.lastb THEN (CASE WHEN {_A} > s2.ba THEN m.y ELSE s2.byy END)
                    ELSE s2.py END,
               CASE WHEN m.lastb THEN CAST(-1 AS BIGINT)
                    ELSE (CASE WHEN {_A} > s2.ba THEN {_A} ELSE s2.ba END) END,
               CASE WHEN m.lastb THEN CAST(0 AS BIGINT)
                    ELSE (CASE WHEN {_A} > s2.ba THEN m.x ELSE s2.bx END) END,
               CASE WHEN m.lastb THEN CAST(0 AS BIGINT)
                    ELSE (CASE WHEN {_A} > s2.ba THEN m.y ELSE s2.byy END) END,
               m.lastb,
               CASE WHEN {_A} > s2.ba THEN m.x ELSE s2.bx END,
               CASE WHEN {_A} > s2.ba THEN m.y ELSE s2.byy END
        FROM st s2 JOIN mord m ON m.s = s2.s AND m.i = s2.i + 1
        WHERE s2.i < s2.mtot
    ),
    sel AS (SELECT s, sel_x AS x, sel_y AS y FROM st WHERE emit),
    ends AS (
        SELECT s, x, y FROM big WHERE pos = 1 OR pos = n
    )
    SELECT s AS {series_alias}, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM (
        SELECT * FROM small
        UNION ALL SELECT * FROM ends
        UNION ALL SELECT * FROM sel
    )
    """
