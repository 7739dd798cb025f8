"""Training-data curation plans: dedup clustering, contamination checks,
deterministic sampling, corpus statistics, shard assignment.

These extend the dedup/similarity family (SURVEY.md §7 step 7 / project
brief) with the operations a pretraining-data pipeline runs *after* pair
generation: resolve pairs into clusters (keep one doc per cluster), check
a training corpus for benchmark contamination, draw reproducible samples,
and lay the surviving corpus out into token-balanced shards.

Every query here has a DuckDB oracle; cross-engine determinism notes inline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.cc import cluster_sizes, connected_components
from ..operators.dedup import jaccard_pairs_cached, release_persisted
from ..sources.tables import load_table

#: DuckDB CTE: distinct 3-word shingle sets per doc (mirrors
#: operators/dedup.shingle_rows semantics; shared with llm_text oracles)
_SHINGLES_CTE = r"""
    t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
               list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t WHERE len(toks) >= 3
    )
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


#: Sweep-scale sampled-oracle contract (r10 verdict #3). The exact
#: all-pairs jaccard oracles behind the near-dup family are quadratic BY
#: DESIGN (~830 s at sf0.1, hours at sf1), so the full-catalog sweep
#: skip-lists them and their at-scale correctness used to ride invariant
#: companions. The ``*_sampled`` variants below restrict BOTH engines to
#: the same deterministic md5-bucket sample of documents (4% ≈ 2k docs /
#: ~2M oracle pairs at sf1 — minutes of DuckDB, not hours), giving the
#: inverted-index, LSH, CC and incremental-ingest code paths DIRECT
#: oracle rows at sweep scale. 4% balances oracle cost (quadratic in the
#: sample) against planted-pair survival (quadratic thinning: a pair
#: survives with p = 0.0016, so sf1's ~2.5k planted pairs keep a handful
#: while the true-negative mass — what the index guards against — stays
#: ~2k docs strong).
#:
#: Env-tunable (read ONCE at import, so the Spark filter and the oracle
#: SQL can never disagree): the quadratic oracle cost is
#: The sampled twins' oracle cost is (sampled docs)^2 in shingle pairs.
#: A FIXED percentage is quadratic in fixture size — r11's 4% was
#: calibrated for sf1 (50k docs -> 2k sampled) and blew the 600 s sweep
#: watchdog at sf10 (20k sampled -> 400M pairs).  The rate therefore
#: SCALES INVERSELY with fixture size to hold the sampled-doc count
#: constant at SWEEP_TARGET_DOCS, capped at SWEEP_SAMPLE_PCT so every
#: fixture at or below the sf1 calibration point keeps the full 4%
#: (thinner samples thin planted POSITIVES quadratically — at huge
#: fixtures the check trends toward true-negative verification, which
#: is still the guard that matters at scale).  Both knobs stay
#: env-overridable for sweep experiments.
SWEEP_SAMPLE_PCT = int(os.environ.get("KICKHOUSE_SWEEP_SAMPLE_PCT", "4"))
SWEEP_TARGET_DOCS = int(os.environ.get("KICKHOUSE_SWEEP_TARGET_DOCS", "2000"))

#: per-million md5 buckets (a per-100 bucket cannot express the 0.4%
#: an sf10 fixture needs)
_SAMPLE_BUCKETS = 1_000_000


def sweep_keep_buckets(n_docs: int) -> int:
    """How many per-million buckets the sampled family keeps for a
    corpus of ``n_docs`` — integer arithmetic both engines reproduce
    exactly (DuckDB ``//`` below mirrors Python's)."""
    return min(
        SWEEP_SAMPLE_PCT * (_SAMPLE_BUCKETS // 100),
        (_SAMPLE_BUCKETS * SWEEP_TARGET_DOCS) // max(n_docs, 1),
    )


#: The sample key is the MIN over a doc's 3-word shingles of
#: md5(shingle) — the MinHash property makes the sample
#: CLUSTER-PRESERVING: two near-dups with Jaccard J share their min
#: shingle with probability J, so a planted positive pair survives the
#: sample at ~rate·J (LINEAR in the rate) instead of rate² — a plain
#: doc_id sample at sf10's 0.4% rate kept zero positives and the check
#: degenerated to true-negative verification.  Docs with < 3 tokens
#: fall back to md5(doc_id).  The keep threshold derives from COUNT(*)
#: of the SAME table inside the query, so one static oracle string
#: adapts itself to any fixture size.  Shingle spelling is identical to
#: _DUCKDB_SHINGLES / functions.text.word_shingles — the already-proven
#: cross-engine tokenization.
_SMP_KEEP_SQL = (
    f"LEAST({SWEEP_SAMPLE_PCT * (_SAMPLE_BUCKETS // 100)}, "
    f"({_SAMPLE_BUCKETS}::BIGINT * {SWEEP_TARGET_DOCS})"
    " // (SELECT COUNT(*) FROM documents))"
)

#: CTE prelude defining ``sd`` (the sampled documents table); names are
#: _smp_-prefixed so they can never collide with oracle CTE names.
SWEEP_SD_CTES = rf"""
    _smp_toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ),
    _smp_key AS (
        SELECT doc_id,
               COALESCE(
                   CASE WHEN len(toks) >= 3 THEN
                       list_aggregate(
                           list_transform(
                               [toks[i] || ' ' || toks[i+1] || ' '
                                || toks[i+2]
                                for i in range(1, len(toks) - 1)],
                               x -> md5(x)),
                           'min')
                   END,
                   md5(CAST(doc_id AS VARCHAR))) AS k
        FROM _smp_toks
    ),
    _smp_kept AS (
        SELECT doc_id FROM _smp_key
        WHERE CAST(('0x' || substr(k, 1, 8)) AS BIGINT)
              % {_SAMPLE_BUCKETS} < {_SMP_KEEP_SQL}
    ),
    sd AS (
        SELECT d.* FROM documents d
        JOIN _smp_kept USING (doc_id)
    )"""


def sweep_sample_key(sf_dir: str) -> str:
    """Shared pair/shingle cache key for the sampled variants — distinct
    from the full-corpus key so the two never collide, shared across the
    sampled family so CC reuses the sampled pair cache."""
    return f"{sf_dir}#s{SWEEP_SAMPLE_PCT}t{SWEEP_TARGET_DOCS}"


def sampled_oracle(oracle: str) -> str:
    """Rewrite a documents-table oracle to run on the deterministic
    sample: every ``FROM documents`` (with or without alias) is pointed
    at a prepended ``sd`` CTE holding the sampled rows (min-shingle
    cluster-preserving sample — see SWEEP_SD_CTES). Keeping the original
    SQL as the single source of truth means the sampled oracle can never
    drift from the full one."""
    body = oracle.replace("FROM documents", "FROM sd")
    for kw in ("WITH RECURSIVE", "WITH"):
        idx = body.find(kw)
        if idx >= 0:
            cut = idx + len(kw)
            return body[:cut] + " " + SWEEP_SD_CTES + ", " + body[cut:]
    return "WITH " + SWEEP_SD_CTES + " " + body


#: sf_dir -> corpus size, so repeated sampled queries pay the parquet
#: count-star (row-group metadata only) once per fixture
_NDOCS_CACHE: dict[str, int] = {}


def _docs_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic sweep sample: min-shingle-md5 per-million
    bucket below the scale-adaptive keep threshold (see
    sweep_keep_buckets and SWEEP_SD_CTES — the Spark spelling of the
    same cluster-preserving key, so engine and oracle always keep the
    IDENTICAL doc set)."""
    from ..functions.text import word_shingles

    if sf_dir not in _NDOCS_CACHE:
        _NDOCS_CACHE[sf_dir] = _docs(spark, sf_dir).count()
    keep = sweep_keep_buckets(_NDOCS_CACHE[sf_dir])
    key = F.coalesce(
        F.array_min(
            F.transform(word_shingles("text", 3), lambda s: F.md5(s))
        ),
        F.md5(F.col("doc_id").cast("string")),
    )
    bucket = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        % _SAMPLE_BUCKETS
    )
    return _docs(spark, sf_dir).filter(bucket < keep)


#: sf_dir -> persisted (id, component) labels for the standard near-dup
#: clustering (3-gram Jaccard >= 0.5). docs_dup_clusters and
#: docs_dedup_survivors consume the SAME clustering; without sharing, each
#: re-runs the iterative large-star/small-star rounds (~3 s at sf0.1,
#: hours at 100 TB). Labels are two 8-byte columns per doc — cheap to pin.
_CC_CACHE: dict[str, DataFrame] = {}


def _dup_components(
    spark: SparkSession, sf_dir: str, sampled: bool = False
) -> DataFrame:
    key = sweep_sample_key(sf_dir) if sampled else sf_dir
    hit = _CC_CACHE.get(key)
    if hit is not None:
        return hit
    docs = (
        _docs_sampled(spark, sf_dir) if sampled else _docs(spark, sf_dir)
    )
    # materialize=False: CC's first eager checkpoint computes the pairs
    # through lineage, populating the persisted pair cache in the same
    # pass — no separate pair-materialization barrier.
    pairs = jaccard_pairs_cached(
        docs, "text", "doc_id", n=3, threshold=0.5, cache_key=key,
        materialize=False,
    )
    comps = connected_components(
        pairs,
        src="a_id",
        dst="b_id",
        nodes=docs.select(F.col("doc_id").alias("id")),
        # jaccard pairs end in a groupBy(a_id, b_id): unique by
        # construction — skip the initial edge-dedup shuffle
        assume_distinct=True,
    ).persist()
    comps.count()
    release_persisted()  # shingle-index intermediates; pairs/comps stay pinned
    # evict other FIXTURES only: the full and sampled clusterings of the
    # same fixture serve adjacent catalog queries in an alphabetical
    # sweep — evicting across the full/sampled boundary would recompute
    # CC four times per suite instead of twice
    base = key.split("#")[0]
    for k in [k for k in _CC_CACHE if k.split("#")[0] != base]:
        _CC_CACHE.pop(k).unpersist(blocking=True)
    _CC_CACHE[key] = comps
    return comps


def clear_component_cache() -> None:
    for k in list(_CC_CACHE):
        _CC_CACHE.pop(k).unpersist(blocking=True)


@register(
    "docs_dup_clusters",
    bench=True,
    tags=("dedup", "cc", "iterative"),
    oracle="WITH RECURSIVE "
    + _SHINGLES_CTE
    + """,
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE LEN(list_intersect(a.sh, b.sh)) * 1.0
              / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ), reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
    ), comp AS (
        SELECT id, MIN(r) AS component FROM reach GROUP BY id
    )
    SELECT component AS cluster_rep, COUNT(*) AS cluster_size
    FROM comp GROUP BY component
    """,
)
def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (3-gram Jaccard >= 0.5) resolved into connected
    components via alternating large-star/small-star (operators/cc.py);
    every document labels with its cluster's minimum doc_id. The oracle
    computes the same transitive closure with a recursive CTE — exact
    match proves both the pair generation AND the O(log n)-round cluster
    resolution. Output: one row per cluster (singletons included)."""
    comps = _dup_components(spark, sf_dir)
    return cluster_sizes(comps).select(
        F.col("component").alias("cluster_rep"), "cluster_size"
    )


@register(
    "docs_dedup_survivors",
    tags=("dedup", "cc"),
    oracle="WITH RECURSIVE "
    + _SHINGLES_CTE
    + """,
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE LEN(list_intersect(a.sh, b.sh)) * 1.0
              / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION SELECT b_id, a_id FROM pairs
    ), reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
    ), comp AS (
        SELECT id, MIN(r) AS component FROM reach GROUP BY id
    )
    SELECT d.lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN c.component = d.doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(CASE WHEN c.component = d.doc_id
               THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM documents d JOIN comp c ON c.id = d.doc_id
    GROUP BY d.lang
    """,
)
def docs_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision a dedup pipeline actually ships: keep the
    cluster representative (minimum doc_id), drop the rest — aggregated
    per language. Deterministic because the representative is the
    component min, not an arbitrary survivor."""
    docs = _docs(spark, sf_dir)
    comps = _dup_components(spark, sf_dir)
    labeled = docs.join(comps, docs["doc_id"] == comps["id"])
    kept = F.when(F.col("component") == F.col("doc_id"), 1).otherwise(0)
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        (F.count(F.lit(1)) - F.sum(kept)).alias("n_dropped"),
    )


@register(
    "docs_contamination",
    bench=True,
    tags=("dedup", "contamination"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
               list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                              || ' ' || toks[i+3] || ' ' || toks[i+4]
                              for i in range(1, len(toks) - 3)]) AS sh
        FROM t WHERE len(toks) >= 5
    ), train AS (
        SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 20 <> 0
    ), test AS (
        SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 20 = 0
    )
    SELECT te.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contained,
           ROUND(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS containment
    FROM test te LEFT JOIN train tr ON te.g = tr.g
    GROUP BY te.doc_id
    """,
)
def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: hold out every 20th document as the
    'benchmark' split and measure 5-gram containment of each held-out doc
    in the remaining 'training' corpus (operators/dedup.ngram_containment).
    The deterministic doc_id-modulo split makes the check SQL-expressible
    for the oracle; a real pipeline passes an actual benchmark table."""
    from ..operators.dedup import ngram_containment_split

    docs = _docs(spark, sf_dir)
    return ngram_containment_split(
        docs, lambda i: i % 20 == 0, "text", "doc_id", n=5
    )


def sample_bucket(key: F.Column, n_buckets: int = 100) -> F.Column:
    """Deterministic, engine-portable sampling bucket in [0, n_buckets):
    first 8 hex chars of md5(key-as-string) parsed as an integer, mod N.
    md5 of the decimal string is identical in every engine (unlike
    xxhash64, which only Spark exposes), so a sample drawn this way is
    reproducible by any downstream system auditing the pipeline — and it
    is stable under repartitioning, unlike ``rand(seed)`` whose draw
    depends on partition layout."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


#: per-language sampling percentage (an 'upsample rare languages' policy)
_SAMPLE_PCT = {"en": 10, "fr": 25, "de": 25, "es": 25, "zh": 50}
_SAMPLE_PCT_DEFAULT = 50


@register(
    "docs_stratified_sample",
    tags=("sampling", "A1"),
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, lang, bucket
    FROM b
    WHERE bucket < CASE lang
        WHEN 'en' THEN {_SAMPLE_PCT["en"]} WHEN 'fr' THEN {_SAMPLE_PCT["fr"]}
        WHEN 'de' THEN {_SAMPLE_PCT["de"]} WHEN 'es' THEN {_SAMPLE_PCT["es"]}
        WHEN 'zh' THEN {_SAMPLE_PCT["zh"]} ELSE {_SAMPLE_PCT_DEFAULT} END
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates applied via an
    md5 hash bucket (no rand() — the sample is a pure function of doc_id,
    so re-runs, retries, and other engines draw the SAME sample; the oracle
    proves it by reproducing the bucket arithmetic in DuckDB). At 100 TB
    this is a narrow map + filter — no shuffle, no state."""
    docs = _docs(spark, sf_dir)
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _SAMPLE_PCT.items()],
        F.lit(_SAMPLE_PCT_DEFAULT),
    )
    return (
        docs.withColumn("bucket", sample_bucket(F.col("doc_id")))
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


@register(
    "docs_temperature_mixture_sample",
    tags=("sampling", "mixture", "A1"),
    oracle=r"""
    WITH t AS (
        SELECT source,
               CAST(SUM(LEN(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                   AS toks
        FROM documents GROUP BY source
    ), w AS (
        SELECT source, toks,
               CAST(FLOOR(SQRT(CAST(toks AS DOUBLE))) AS BIGINT) AS wgt
        FROM t
    ), g AS (
        SELECT CAST(SUM(toks) AS HUGEINT) AS total,
               CAST(SUM(wgt) AS HUGEINT) AS wsum
        FROM w
    ), r AS (
        SELECT source, toks, wgt,
               LEAST(CAST(10000 AS HUGEINT),
                     (CAST(10000 AS HUGEINT) * (total // 5) * wgt)
                         // (wsum * toks)) AS rate_bp
        FROM w, g
    )
    SELECT d.doc_id, d.source,
           CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 10000 AS bucket,
           CAST(r.rate_bp AS BIGINT) AS rate_bp
    FROM documents d JOIN r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 10000 < r.rate_bp
    """,
)
def docs_temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing — the data-mixture op used when
    balancing corpora for training (multinomial sampling with temperature,
    XLM-R style): per-source sampling weight ∝ share^0.5, realized as a
    deterministic subsample hitting a 20%-of-total token budget.

    Every rate is INTEGER-exact so the sample is bitwise reproducible
    cross-engine (the oracle recomputes it in DuckDB HUGEINT): α = 0.5 via
    integer sqrt of the per-source token sum (floor(sqrt) of an exact
    BIGINT is engine-identical for any realistic count), the basis-point
    threshold via exact decimal/int128 floor division — no double ever
    feeds the membership filter; membership itself is the md5 bucket of
    doc_id (repartition-stable, no rand()). At 100 TB: one map-side-
    combined per-source aggregate (|sources| rows), rates broadcast back,
    then a narrow filter — no corpus shuffle at all."""
    from ..functions.text import token_count

    docs = _docs(spark, sf_dir).withColumn("n_tok", token_count("text"))
    per_src = docs.groupBy("source").agg(F.sum("n_tok").alias("toks"))
    per_src = per_src.withColumn(
        "wgt", F.floor(F.sqrt(F.col("toks").cast("double"))).cast("long")
    )
    # global totals via an unpartitioned window over the |sources|-row
    # aggregate — a crossJoined scalar aggregate would re-evaluate the
    # corpus-scanning subtree for the 1-row side (second full scan)
    wall = Window.partitionBy()
    rates = per_src.withColumn("total", F.sum("toks").over(wall)).withColumn(
        "wsum", F.sum("wgt").over(wall)
    ).select(
        "source",
        F.least(
            F.lit(10000).cast("long"),
            F.expr(
                "(CAST(10000 AS DECIMAL(5,0)) * CAST(total div 5 AS DECIMAL(20,0))"
                " * CAST(wgt AS DECIMAL(12,0)))"
                " div (CAST(wsum AS DECIMAL(14,0)) * CAST(toks AS DECIMAL(20,0)))"
            ),
        ).alias("rate_bp"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("bucket", sample_bucket(F.col("doc_id"), 10000))
        .filter(F.col("bucket") < F.col("rate_bp"))
        .select("doc_id", "source", "bucket", "rate_bp")
    )


@register(
    "docs_length_percentiles",
    tags=("stats", "A4"),
    oracle=r"""
    WITH m AS (
        SELECT lang, n_chars,
               LEN(string_split_regex(trim(text), '\s+')) AS n_tok
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(quantile_cont(n_chars, 0.25) + 1e-9, 4) AS chars_p25,
           ROUND(quantile_cont(n_chars, 0.50) + 1e-9, 4) AS chars_p50,
           ROUND(quantile_cont(n_chars, 0.90) + 1e-9, 4) AS chars_p90,
           ROUND(quantile_cont(n_chars, 0.99) + 1e-9, 4) AS chars_p99,
           ROUND(quantile_cont(n_tok, 0.50) + 1e-9, 4) AS tokens_p50,
           CAST(MAX(n_chars) AS BIGINT) AS chars_max
    FROM m GROUP BY lang
    """,
)
def docs_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length percentiles (linear interpolation — the
    same definition as DuckDB's quantile_cont). The length histogram is the
    first thing a corpus curator looks at; exact percentiles need a per-group
    sort, which Spark's `percentile` does with partial aggregation (at
    100 TB prefer `approx_percentile` — bounded-memory KLL-style sketch;
    docs_percentiles_approx_invariant below proves its error bound;
    here exactness is the point, to pin the oracle)."""
    from ..functions.text import token_count

    d = _docs(spark, sf_dir).select(
        "lang", "n_chars", token_count("text").alias("n_tok")
    )

    # one percentile buffer per MEASURE, not per quantile: the four
    # n_chars quantiles share a single array-percentile aggregate (each
    # partial_percentile buffer is a full per-group value-count map —
    # guide §2.3, same rewrite as events_quantiles_exact); values are
    # identical R-7 interpolations, projected back to scalar columns.
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile(
            "n_chars", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.90), F.lit(0.99))
        ).alias("_cq"),
        F.percentile("n_tok", F.lit(0.50)).alias("_tq"),
        F.max("n_chars").alias("chars_max"),
    )
    return agg.select(
        "lang",
        "n_docs",
        *[
            F.round(F.col("_cq").getItem(i) + 1e-9, 4).alias(f"chars_p{tag}")
            for i, tag in enumerate(("25", "50", "90", "99"))
        ],
        F.round(F.col("_tq") + 1e-9, 4).alias("tokens_p50"),
        "chars_max",
    )


@register(
    "docs_percentiles_approx_invariant",
    tags=("stats", "invariant"),
    oracle="SELECT lang, TRUE AS approx_ok FROM documents GROUP BY lang",
)
def docs_percentiles_approx_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariant for the sketch-specific approx_percentile
    (the 100 TB percentile path — bounded memory, mergeable partials): the
    approximate median must land between the exact 45th and 55th
    percentiles. The oracle states the expectation (TRUE per language);
    the Spark side must EARN it from the actual sketch output."""
    d = _docs(spark, sf_dir)
    agg = d.groupBy("lang").agg(
        F.percentile_approx("n_chars", 0.5, 10_000).alias("ap50"),
        F.percentile("n_chars", F.lit(0.45)).alias("lo"),
        F.percentile("n_chars", F.lit(0.55)).alias("hi"),
    )
    return agg.select(
        "lang",
        ((F.col("ap50") >= F.col("lo")) & (F.col("ap50") <= F.col("hi"))).alias(
            "approx_ok"
        ),
    )


@register(
    "docs_token_shards",
    bench=True,
    tags=("shards", "WF1"),
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               LEN(string_split_regex(trim(text), '\s+')) AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prefix
        FROM w
    )
    SELECT CAST(prefix // 2000 AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY prefix // 2000
    """,
)
def docs_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment (~2000 tokens/shard) via the
    two-phase distributed prefix sum in operators/shards.py — no global
    single-partition window anywhere. The oracle recomputes the assignment
    with a plain window cumsum (fine at 500 rows; the point of the operator
    is that Spark never runs that plan shape at 100 TB)."""
    from ..functions.text import token_count

    from ..operators.shards import token_balanced_shards

    d = _docs(spark, sf_dir).select("doc_id", token_count("text").alias("n_tok"))
    sharded = token_balanced_shards(
        d, "n_tok", "doc_id", target_per_shard=2000, bucket_width=100
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "docs_pack_sequences",
    tags=("shards", "packing", "WF1"),
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               CAST(LEN(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, n_tok,
               -- CAST: DuckDB SUM(BIGINT) window yields HUGEINT, which the
               -- driver's compare frame coerces to float64 and the value
               -- hash diverges from Spark's int64 even when values match.
               CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS prefix
        FROM w WHERE n_tok > 0
    )
    , s AS (
        SELECT doc_id, prefix, n_tok,
               unnest(generate_series(CAST(prefix // 256 AS BIGINT),
                                      CAST((prefix + n_tok - 1) // 256
                                           AS BIGINT))) AS seq_id
        FROM c
    )
    SELECT doc_id, seq_id,
           CAST(GREATEST(seq_id * 256, prefix) - prefix AS BIGINT)
               AS begin_tok,
           CAST(LEAST((seq_id + 1) * 256, prefix + n_tok) - prefix AS BIGINT)
               AS end_tok
    FROM s
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing layout (operators/shards.pack_sequences): the
    corpus token stream, in doc_id order, cut into 256-token training
    sequences — one row per (doc, sequence) slice with in-doc
    begin/end offsets. The engine-side layout replaces data-loader
    packing state: pure long prefix-sum arithmetic (two-phase scan, no
    global window), so retries and other engines reproduce the exact
    same training batches. The oracle recomputes the slice set with a
    window cumsum + generate_series in DuckDB."""
    from ..functions.text import token_count
    from ..operators.shards import pack_sequences

    d = _docs(spark, sf_dir).select("doc_id", token_count("text").alias("n_tok"))
    return pack_sequences(
        d, "n_tok", "doc_id", seq_len=256, bucket_width=100
    ).select("doc_id", "seq_id", "begin_tok", "end_tok")


@register(
    "docs_train_val_test_split",
    tags=("sampling", "split", "A1"),
    oracle=r"""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(LEN(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tok,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'validation'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM b GROUP BY 1, 2
    """,
)
def docs_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test assignment — the
    canonical corpus-preparation split, as a pure function of doc_id
    (md5 bucket: reproducible across engines/retries, stable under
    repartitioning, and any doc's split can be recomputed in isolation
    — no rand(), no persisted split table needed). Per-(split, lang)
    doc/token accounting; the assignment itself is a narrow map, so at
    100 TB the split costs one column expression at read time."""
    from ..functions.text import token_count

    docs = _docs(spark, sf_dir).withColumn("n_tok", token_count("text"))
    bucket = sample_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


@register(
    "docs_global_shuffle",
    tags=("sampling", "layout", "O1"),
    oracle=r"""
    WITH k AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS key
        FROM documents
    ), r AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY key, doc_id) - 1 AS rnk
        FROM k
    )
    SELECT doc_id,
           CAST(rnk % 8 AS INTEGER) AS shard,
           CAST(rnk // 8 AS BIGINT) AS pos_in_shard
    FROM r
    """,
)
def docs_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards
    (operators/shards.py: global_shuffle) — randomize document order
    before training as a pure function of doc_id (md5 permutation key,
    round-robin deal). The oracle's single ORDER BY window is exactly the
    plan this operator exists to avoid: the engine computes the same rank
    with the two-phase parallel prefix scan (per-bucket aggregate +
    O(n_buckets) offsets window + per-bucket local windows), which is the
    shape that survives 100 TB."""
    from ..operators.shards import global_shuffle

    return global_shuffle(_docs(spark, sf_dir), "doc_id", n_shards=8)


@register(
    "docs_weighted_sample",
    tags=("sampling", "A9"),
    oracle=r"""
    WITH d AS (
        SELECT source, doc_id,
               LEN(string_split_regex(trim(text), '\s+')) AS n_tok
        FROM documents
    ), k AS (
        SELECT source, doc_id, n_tok,
               LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1)
                  / CAST(4294967296 AS DOUBLE)) / n_tok AS key
        FROM d
    )
    SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY key DESC, doc_id ASC
           ) AS INTEGER) AS rank
    FROM k
    QUALIFY rank <= 5
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, 5 docs per
    source, selection probability ∝ token count — the Efraimidis-Spirakis
    reservoir scheme with the random uniform replaced by the md5 hash of
    doc_id (u = (h32 + 1)/2^32 ∈ (0, 1], key = ln(u)/w; top-k by key).
    Pure function of the ids: reproducible across engines, retries and
    repartitioning — the weighted counterpart of docs_per_source_sample.

    At 100 TB the per-source rank is a window over (source)-partitioned
    rows carrying only (id, weight, key); with very hot sources, swap the
    full sort for a per-partition top-k + merge (the TakeOrderedAndProject
    shape) — semantics unchanged, the key is the whole contract."""
    from ..functions.text import token_count

    d = _docs(spark, sf_dir).select(
        "source", "doc_id", token_count("text").alias("n_tok")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    key = F.log((h + 1) / F.lit(4294967296.0)) / F.col("n_tok")
    w = Window.partitionBy("source").orderBy(
        key.desc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("source", "doc_id", F.col("n_tok").cast("long").alias("n_tok"), "rank")
    )


@register(
    "docs_elastic_reshard",
    tags=("layout", "sharding"),
    oracle=r"""
    WITH r AS (
        SELECT doc_id,
               (list_max([{'h': CAST(('0x' || substr(md5(
                               CAST(doc_id AS VARCHAR) || ':'
                               || CAST(s AS VARCHAR)), 1, 8)) AS BIGINT),
                           's': s} for s in range(0, 8)])).s AS sb,
               (list_max([{'h': CAST(('0x' || substr(md5(
                               CAST(doc_id AS VARCHAR) || ':'
                               || CAST(s AS VARCHAR)), 1, 8)) AS BIGINT),
                           's': s} for s in range(0, 9)])).s AS sa
        FROM documents
    )
    SELECT doc_id,
           CAST(sb AS INTEGER) AS shard_before,
           CAST(sa AS INTEGER) AS shard_after,
           sb <> sa AS moved
    FROM r
    """,
)
def docs_elastic_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elastic reshard via rendezvous hashing (operators/shards.py:
    rendezvous_shard): each doc's shard under 8 and under 9 shards, plus
    the moved flag. The rendezvous property — visible in the data — is
    that ONLY docs the new shard wins relocate (~1/9 of the corpus, all
    with shard_after = 8), where pmod resharding would move ~8/9 of it.
    Pure column expressions, zero shuffle; the oracle replays the
    struct-argmax bit for bit."""
    from ..operators.shards import rendezvous_shard

    return _docs(spark, sf_dir).select(
        "doc_id",
        rendezvous_shard("doc_id", 8).cast("int").alias("shard_before"),
        rendezvous_shard("doc_id", 9).cast("int").alias("shard_after"),
        (
            rendezvous_shard("doc_id", 8) != rendezvous_shard("doc_id", 9)
        ).alias("moved"),
    )


@register(
    "docs_distribution_drift",
    tags=("stats", "drift", "A3"),
    oracle=r"""
    WITH w AS (
        SELECT lang, doc_id % 2 AS split,
               LEAST(CAST(LEN(string_split_regex(trim(text), '\s+')) AS BIGINT)
                     // 50, 9) AS bin
        FROM documents
    ), c AS (
        SELECT lang, bin,
               CAST(SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM w GROUP BY lang, bin
    ), t AS (
        SELECT lang, SUM(c0) AS t0, SUM(c1) AS t1 FROM c GROUP BY lang
    ), p AS (
        SELECT c.lang, c.bin,
               GREATEST(c.c0 * 1.0 / t.t0, 0.000001) AS p0,
               GREATEST(c.c1 * 1.0 / t.t1, 0.000001) AS p1
        FROM c JOIN t ON c.lang = t.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM((p0 - p1) * LN(p0 / p1)) + 1e-9, 4) AS psi
    FROM p GROUP BY lang
    """,
)
def docs_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus snapshots — the monitoring
    gate a training pipeline runs on every ingest (did this crawl's
    length profile shift?). Population Stability Index per language over
    banded token-length bins (width 50, capped at 10 bins), even/odd
    doc_id halves standing in for the two snapshots; proportions clamped
    at 1e-6 so one-sided bins contribute a finite penalty (standard PSI
    practice). Plan: one (lang, bin) aggregate with conditional partial
    counts — map-side combined, one shuffle on (lang, bin) plus a tiny
    per-lang totals join; rule of thumb PSI > 0.2 = investigate. ln() is
    libm-dependent in the last ulp, hence the suite's ROUND(+1e-9, 4)
    convention on both sides."""
    from ..functions.text import token_count

    docs = _docs(spark, sf_dir).withColumn("n_tok", token_count("text"))
    w = docs.select(
        "lang",
        (F.col("doc_id") % 2).alias("split"),
        F.least(F.expr("n_tok div 50"), F.lit(9).cast("long")).alias("bin"),
    )
    c = w.groupBy("lang", "bin").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    # per-lang totals via a window over the (lang, bin) aggregate rows —
    # ≤ langs × 10 rows; a join against an aggregate OF this aggregate
    # would re-evaluate the corpus-scanning subtree a second time
    wl = Window.partitionBy("lang")
    p = c.select(
        "lang",
        F.greatest(
            F.col("c0") * 1.0 / F.sum("c0").over(wl), F.lit(0.000001)
        ).alias("p0"),
        F.greatest(
            F.col("c1") * 1.0 / F.sum("c1").over(wl), F.lit(0.000001)
        ).alias("p1"),
    )
    return p.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(
            F.sum((F.col("p0") - F.col("p1")) * F.log(F.col("p0") / F.col("p1")))
            + 1e-9,
            4,
        ).alias("psi"),
    )


@register(
    "docs_per_source_sample",
    tags=("sampling", "WF2"),
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def docs_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reservoir-style k-per-group sampling, deterministically: rank by the
    md5 of the id within each source and keep the first 3. Statistically a
    uniform draw (hash order is pseudo-random), operationally a window —
    partitioned by source, so fully parallel, no global sort. Re-runs and
    other engines reproduce the same 'random' sample — the property actual
    reservoir sampling (rand-dependent) can't give you at 100 TB."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    win = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id", F.row_number().over(win).cast("long").alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "events_hourly_anomalies",
    tags=("stats", "A2", "WF1"),
    oracle="""
    WITH h AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
    ), stats AS (
        SELECT event_type,
               COUNT(*) AS n_hours,
               CAST(SUM(n) AS BIGINT) AS sum_n,
               CAST(SUM(n * n) AS BIGINT) AS sum_sq
        FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hour, h.n,
           ROUND((h.n - sum_n * 1.0 / n_hours)
                 / sqrt((sum_sq - sum_n * 1.0 * sum_n / n_hours)
                        / (n_hours - 1)) + 1e-9, 4) AS zscore
    FROM h JOIN stats ON h.event_type = stats.event_type
    WHERE abs((h.n - sum_n * 1.0 / n_hours)
              / sqrt((sum_sq - sum_n * 1.0 * sum_n / n_hours)
                     / (n_hours - 1))) >= 2.0
    """,
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts whose z-score (vs that
    event type's own distribution) exceeds ±2σ — the DQ alarm the reference
    triages by hand in its notebook. Variance comes from EXACT integer sums
    (Σn, Σn²) rather than a streaming float variance aggregate, so the
    result is bitwise reproducible under any partitioning, and the oracle
    matches hash-for-hash. Two shuffles total: the hourly rollup, then a
    per-type stats aggregate small enough to broadcast back."""
    from ..sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    joined = hourly.join(F.broadcast(stats), "event_type")
    mean = F.col("sum_n") * 1.0 / F.col("n_hours")
    var = (F.col("sum_sq") - F.col("sum_n") * 1.0 * F.col("sum_n") / F.col("n_hours")) / (
        F.col("n_hours") - 1
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        joined.filter(F.abs(z) >= 2.0)
        .select(
            "event_type",
            "hour",
            "n",
            F.round(z + 1e-9, 4).alias("zscore"),
        )
    )


@register(
    "docs_grouping_sets_counts",
    tags=("A1", "rollup"),
    oracle="""
    SELECT COALESCE(source, 'ALL') AS src,
           COALESCE(lang, 'ALL') AS lng,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
    """,
)
def docs_grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of rollup/cube (SURVEY §2.5
    zero-cost extensions): one shuffle produces the (source,lang) grid,
    both marginals, and the grand total via Expand. Expressed through the
    engine's SQL surface over a registered view; sentinel 'ALL' stands in
    for the grouping NULLs so rows stay distinguishable cross-engine."""
    _docs(spark, sf_dir).createOrReplaceTempView("_docs_gs")
    return spark.sql(
        """
        SELECT COALESCE(source, 'ALL') AS src,
               COALESCE(lang, 'ALL') AS lng,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS total_chars
        FROM _docs_gs
        GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
        """
    )


@register(
    "events_funnel_signup_purchase",
    tags=("WF2", "funnel"),
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_conversions,
           CAST(MIN(FLOOR(epoch(next_ts) - epoch(ts))) AS BIGINT) AS fastest_secs
    FROM seq
    WHERE event_type = 'signup' AND next_type = 'purchase'
      AND next_ts <= ts + INTERVAL 30 MINUTE
    GROUP BY user_id
    """,
)
def events_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel/sequence detection: a signup IMMEDIATELY followed by a
    purchase within 30 minutes, per user — the event-sequence primitive
    (ClickHouse users reach for sequenceMatch; Spark-first this is a lag/
    lead window partitioned by user, fully parallel across users, no
    cross-row UDF). Ties inside a timestamp are ordered by event_id so the
    'next event' is deterministic cross-engine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    conv = seq.filter(
        (F.col("event_type") == "signup")
        & (F.col("next_type") == "purchase")
        & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    # seconds-between as FLOOR of the fractional-epoch difference — NOT
    # unix_timestamp()-unix_timestamp(): per-operand truncation shifts the
    # result by ±1 s vs engines that subtract exact epochs
    secs = F.floor(F.col("next_ts").cast("double") - F.col("ts").cast("double"))
    return conv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.min(secs).cast("long").alias("fastest_secs"),
    )


@register(
    "docs_incremental_ingest",
    tags=("dedup", "incremental"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
               list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t WHERE len(toks) >= 3
    ), pairs AS (
        SELECT b.doc_id AS bid,
               LEN(list_intersect(b.sh, c.sh)) * 1.0
                 / LEN(list_distinct(list_concat(b.sh, c.sh))) AS j
        FROM s b JOIN s c
          ON b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        WHERE LEN(list_intersect(b.sh, c.sh)) * 1.0
              / LEN(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
    ), near AS (
        SELECT bid, COUNT(*) AS n_near_matches, MAX(j) AS best_j
        FROM pairs GROUP BY bid
    ), corpus_txt AS (
        SELECT DISTINCT LOWER(TRIM(text)) AS nt FROM documents WHERE doc_id % 2 = 0
    )
    SELECT b.doc_id,
           EXISTS (SELECT 1 FROM corpus_txt c WHERE c.nt = LOWER(TRIM(b.text)))
               AS is_exact_dup,
           COALESCE(n.n_near_matches, 0) AS n_near_matches,
           ROUND(COALESCE(n.best_j, 0.0), 4) AS best_jaccard
    FROM documents b LEFT JOIN near n ON n.bid = b.doc_id
    WHERE b.doc_id % 2 = 1
    """,
)
def docs_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state corpus ingest: odd doc_ids arrive as the new batch, even
    doc_ids are the existing corpus; every batch doc is classified
    exact-dup / near-dup / new via batch-vs-corpus joins ONLY (operators/
    dedup.incremental_dedup — cost scales with the batch, never corpus²).
    The oracle recomputes the bipartite comparison quadratically."""
    from ..operators.dedup import incremental_dedup

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup(corpus, batch, "text", "doc_id", n=3, threshold=0.5)


@register(
    "events_hll_mergeable_distinct",
    tags=("A10", "sketch", "invariant"),
    oracle="SELECT TRUE AS daily_ok, TRUE AS merged_ok",
)
def events_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Spark 4 DataSketches HLL): daily
    user sketches unioned into a total — the 100 TB distinct path, because
    partial sketches merge associatively across partitions AND across days
    without re-scanning history (exact count_distinct re-shuffles raw ids
    every time). Invariant earned by the Spark side: every daily estimate
    and the merged estimate within 5% of exact (HLL lgk=12 gives ~1.6%
    standard error, so 5% is a >3σ bound)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact"),
    )
    daily_ok = daily.select(
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact"))
            <= F.col("exact") * 0.05
        ).alias("ok")
    ).agg(F.min("ok").alias("daily_ok"))
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).crossJoin(ev.agg(F.count_distinct("user_id").alias("exact")))
    merged_ok = merged.select(
        (F.abs(F.col("est") - F.col("exact")) <= F.col("exact") * 0.05).alias(
            "merged_ok"
        )
    )
    return daily_ok.crossJoin(merged_ok)


@register(
    "events_weekly_cohort_retention",
    tags=("A1", "WF2", "cohort"),
    oracle="""
    WITH wk AS (
        SELECT user_id,
               CAST(FLOOR((FLOOR(epoch(ts) / 86400) + 3) / 7) AS BIGINT)
                   AS week_idx
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(week_idx) AS cohort_idx FROM wk GROUP BY user_id
    ), active AS (
        SELECT DISTINCT w.user_id, f.cohort_idx, w.week_idx
        FROM wk w JOIN firsts f ON w.user_id = f.user_id
    )
    SELECT DATE '1970-01-01' + CAST(cohort_idx * 7 - 3 AS INTEGER)
               AS cohort_week,
           week_idx - cohort_idx AS week_offset,
           COUNT(*) AS active_users
    FROM active
    GROUP BY cohort_idx, week_idx - cohort_idx
    """,
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each subsequent week they stay active — THE product-analytics query.
    Weeks are Monday-anchored indexes from INTEGER epoch-day arithmetic
    (floor(epoch/86400), day 0 = Thursday, +3 shifts to Monday anchor) —
    deliberately NOT date_trunc('week', ts): truncation of an instant is
    session-timezone dependent and silently regroups boundary events when
    a driver runs in a non-UTC zone. Two shuffles (per-user min, then the
    distinct + rollup); the cohort join broadcasts the per-user firsts at
    test scale and shuffle-joins at 100 TB (AQE decides)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor((F.floor(F.col("ts").cast("double") / 86400) + 3) / 7).alias(
            "week_idx"
        ),
    )
    firsts = ev.groupBy("user_id").agg(F.min("week_idx").alias("cohort_idx"))
    active = ev.join(firsts, "user_id").select(
        "user_id", "cohort_idx", "week_idx"
    ).distinct()
    return active.groupBy(
        F.date_from_unix_date((F.col("cohort_idx") * 7 - 3).cast("int")).alias(
            "cohort_week"
        ),
        (F.col("week_idx") - F.col("cohort_idx")).alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("active_users"))


@register(
    "events_heavy_users",
    tags=("A1", "sketch", "skew"),
    bench=True,
    oracle="""
    SELECT user_id, COUNT(*) AS cnt
    FROM events GROUP BY user_id HAVING COUNT(*) >= 80
    """,
)
def events_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (users with >= 80 events) via the count-min
    candidate filter + exact verify (operators/heavy.py): the sketch pass
    shuffles at most depth x width bucket rows per task however many
    distinct users exist, and only candidate rows reach the by-key
    shuffle — the 100 TB shape for frequency thresholds over billions of
    keys. The answer is provably identical to the plain GROUP BY ...
    HAVING oracle (count-min never under-counts, and survivors are
    re-counted exactly)."""
    from ..operators.heavy import heavy_hitters

    ev = load_table(spark, sf_dir, "events").select("user_id")
    return heavy_hitters(ev, ["user_id"], min_count=80)


_DSIR_B = 1024  #: hashed-unigram feature buckets (DSIR, Xie et al. 2023)


@register(
    "docs_dsir_importance_sample",
    tags=("sampling", "dsir", "importance", "text"),
    oracle=r"""
    WITH occ AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(t.term), 1, 8)) AS BIGINT) % 1024 AS b
        FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
        WHERE t.term <> ''
    ),
    ct AS (SELECT b, COUNT(*) AS ct FROM occ WHERE lang = 'en' GROUP BY b),
    cr AS (SELECT b, COUNT(*) AS cr FROM occ WHERE lang <> 'en' GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM occ WHERE lang = 'en') AS nt,
                   (SELECT COUNT(*) FROM occ WHERE lang <> 'en') AS nr),
    wt AS (
        SELECT COALESCE(ct.b, cr.b) AS b,
               CAST(ROUND(1000.0 * ln(
                   ((COALESCE(ct, 0) + 1.0) / (nt + 1024))
                   * ((nr + 1024) / (COALESCE(cr, 0) + 1.0))) + 1e-9, 0)
                    AS BIGINT) AS wt
        FROM ct FULL JOIN cr ON ct.b = cr.b, tot
    ),
    scored AS (
        SELECT occ.doc_id, COUNT(*) AS n_toks, SUM(wt.wt) AS score_milli
        FROM occ JOIN wt ON occ.b = wt.b
        WHERE occ.lang <> 'en'
        GROUP BY occ.doc_id
    ),
    pool AS (
        SELECT d.doc_id, d.lang,
               CAST(COALESCE(s.n_toks, 0) AS BIGINT) AS n_toks,
               CAST(COALESCE(s.score_milli, 0) AS BIGINT) AS score_milli
        FROM documents d LEFT JOIN scored s USING (doc_id)
        WHERE d.lang <> 'en'
    )
    SELECT doc_id, lang, n_toks, score_milli
    FROM pool
    QUALIFY ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id)
            <= (SELECT FLOOR(COUNT(*) * 0.1) FROM pool)
    """,
)
def docs_dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023),
    the targeted-curation stage that upweights raw documents resembling a
    quality target corpus. Target distribution = the 'en' split; raw pool
    = everything else; features = hashed unigrams (the engine-portable
    md5 bucket contract every sampling op shares, 1024 buckets). The
    per-bucket log-likelihood ratio ln(p_target(b)/q_raw(b)) (add-one
    smoothed, bucket-count normalizers) is frozen ONCE into an integer
    milli-weight table — ≤1024 rows, broadcast — so each document's score
    is an EXACT integer sum over its token occurrences: no float
    summation-order hazard crosses engines (only the per-bucket ln is
    float, nudge-rounded once, the docs_bigram_logprob discipline). The
    top 10% of the pool by (score, doc_id) is selected via
    TakeOrderedAndProject — never a global sort. 100 TB: one token-bucket
    shuffle for the histograms, one broadcast join + per-doc partial
    aggregate for scoring; the weight table is O(buckets) state that
    ships to any later batch, so steady-state selection costs the batch,
    not the corpus."""
    docs = _docs(spark, sf_dir)
    from ..functions.text import tokens

    occ = (
        docs.select("doc_id", "lang", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
                % _DSIR_B
            ).alias("b"),
        )
    )
    tgt = occ.filter(F.col("lang") == "en")
    raw = occ.filter(F.col("lang") != "en")
    ct = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    cr = raw.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tot = tgt.agg(F.count(F.lit(1)).alias("nt")).crossJoin(
        raw.agg(F.count(F.lit(1)).alias("nr"))
    )
    llr = (
        (F.col("ct") + 1.0) / (F.col("nt") + _DSIR_B)
        * (F.col("nr") + _DSIR_B)
        / (F.col("cr") + 1.0)
    )
    wt = (
        ct.join(cr, "b", "full")
        .select(
            "b",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(1000.0 * F.log(llr) + 1e-9, 0).cast("long").alias("wt"),
        )
    )
    scored = (
        raw.join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.sum("wt").alias("score_milli"))
    )
    pool = (
        docs.filter(F.col("lang") != "en")
        .select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            F.coalesce("score_milli", F.lit(0)).cast("long").alias("score_milli"),
        )
    )
    k = int(pool.count() * 0.1)  # one bounded driver scalar, like the metas
    return pool.orderBy(F.col("score_milli").desc(), "doc_id").limit(k)


@register(
    "docs_weighted_length_percentiles",
    tags=("stats", "percentiles", "weighted"),
    oracle=r"""
    WITH w AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v,
               CAST(LEN(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wt
        FROM documents
    ),
    grp AS (SELECT lang, v, SUM(wt) AS wt FROM w GROUP BY lang, v),
    cum AS (
        SELECT lang, v,
               SUM(wt) OVER (PARTITION BY lang ORDER BY v) AS cw,
               SUM(wt) OVER (PARTITION BY lang) AS tw
        FROM grp
    )
    SELECT lang,
           MIN(CASE WHEN cw * 10 >= 5 * tw THEN v END) AS w_p50,
           MIN(CASE WHEN cw * 10 >= 9 * tw THEN v END) AS w_p90,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum
    GROUP BY lang
    """,
)
def docs_weighted_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles (ClickHouse quantileExactWeighted): per
    language, the token-weighted p50/p90 of document length — 'how long
    is the doc containing the median TOKEN', the curation statistic that
    plain per-doc percentiles misstate when long docs dominate the token
    budget. Exact and engine-portable by construction: the lower weighted
    quantile (smallest v with cumweight >= q.W) is decided with INTEGER
    arithmetic (cw*10 >= q10*tw) — no float interpolation to drift. One
    (lang, v) pre-aggregate bounds the window input to distinct lengths
    per language, so the cumulative scan is tiny at any corpus size."""
    from ..functions.text import token_count

    docs = _docs(spark, sf_dir)
    w = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("v"),
        token_count("text").alias("wt"),
    )
    grp = w.groupBy("lang", "v").agg(F.sum("wt").alias("wt"))
    win = Window.partitionBy("lang").orderBy("v")
    cum = grp.select(
        "lang",
        "v",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(Window.partitionBy("lang")).alias("tw"),
    )
    return cum.groupBy("lang").agg(
        F.min(F.when(F.col("cw") * 10 >= 5 * F.col("tw"), F.col("v"))).alias("w_p50"),
        F.min(F.when(F.col("cw") * 10 >= 9 * F.col("tw"), F.col("v"))).alias("w_p90"),
        F.max("tw").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# Sweep-scale sampled variants of the quadratic-oracle near-dup family
# (r10 verdict #3). Each reuses the ORIGINAL oracle SQL rewritten onto the
# deterministic 4% sample (sampled_oracle — zero drift possible) and the
# SAME Spark operator over the identically-sampled input, so the sf1 sweep
# records direct oracle rows for the inverted-index / CC / incremental
# code paths that the full quadratic oracles cannot verify at scale.
# ---------------------------------------------------------------------------

from ..catalog import REGISTRY as _REGISTRY  # noqa: E402 — originals above


@register(
    "docs_dup_clusters_sampled",
    tags=("dedup", "cc", "sweep-sampled"),
    oracle=sampled_oracle(_REGISTRY["docs_dup_clusters"].oracle),
)
def docs_dup_clusters_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_dup_clusters over the deterministic 4% md5-bucket sample —
    the direct at-scale oracle row for pair generation + large/small-star
    CC (the full recursive-CTE oracle is quadratic; tools/oracle_sweep.py
    skip-lists it above sf0.1)."""
    comps = _dup_components(spark, sf_dir, sampled=True)
    return cluster_sizes(comps).select(
        F.col("component").alias("cluster_rep"), "cluster_size"
    )


@register(
    "docs_dedup_survivors_sampled",
    tags=("dedup", "cc", "sweep-sampled"),
    oracle=sampled_oracle(_REGISTRY["docs_dedup_survivors"].oracle),
)
def docs_dedup_survivors_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_dedup_survivors over the deterministic 4% sample — keep/drop
    decisions per language with a direct oracle at sweep scale."""
    docs = _docs_sampled(spark, sf_dir)
    comps = _dup_components(spark, sf_dir, sampled=True)
    labeled = docs.join(comps, docs["doc_id"] == comps["id"])
    kept = F.when(F.col("component") == F.col("doc_id"), 1).otherwise(0)
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        (F.count(F.lit(1)) - F.sum(kept)).alias("n_dropped"),
    )


@register(
    "docs_incremental_ingest_sampled",
    tags=("dedup", "incremental", "sweep-sampled"),
    oracle=sampled_oracle(_REGISTRY["docs_incremental_ingest"].oracle),
)
def docs_incremental_ingest_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_incremental_ingest over the deterministic 4% sample: odd
    sampled doc_ids arrive as the batch, even sampled doc_ids are the
    corpus — the bipartite batch-vs-corpus classifier with a direct
    oracle at sweep scale."""
    from ..operators.dedup import incremental_dedup

    docs = _docs_sampled(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup(corpus, batch, "text", "doc_id", n=3, threshold=0.5)
