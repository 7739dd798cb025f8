"""BM25 lexical retrieval — the sparse twin of the ANN operators.

Training-data pipelines retrieve lexically as well as semantically
(contamination lookups, hard-negative mining, hybrid RAG indexes). This
module implements Robertson/Lucene BM25 as pure DataFrame algebra:

- **bm25_score_topk** — score a (small, broadcast) query set against the
  corpus and return the top-k docs per query.
- **build_bm25_index / bm25_topk_indexed** — the persisted-index lifecycle
  (same shape as the dedup/IVF index lifecycles in this package): postings
  and document lengths are written once, term-bucketed; queries then touch
  only the postings of their own terms.

Scoring (Lucene variant — idf is always positive):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over DISTINCT terms of q present in d of idf * tf_norm

Query-side term frequency is deliberately ignored (queries are short; this
matches Lucene's default practice).

Scale posture (100 TB corpus, handful-to-thousands of queries):

- The direct scoring path never aggregates full-corpus postings at all
  (r12): the query terms broadcast-semi-filter the exploded token stream
  BEFORE the (doc_id, term) hash aggregate, so the one shuffle the path
  pays moves only query-matched tokens — never the corpus token stream.
  Document frequency stays exact because the filter is term-only (every
  document's occurrences of a matching term survive).
- Document length rides the token stream as a narrow per-row column
  (dl = size of the filtered token array — no postings groupBy), and the
  (N, avgdl) global pair is a 1-row aggregate over a second narrow scan
  of the text column: a columnar re-scan is strictly cheaper than the
  full postings shuffle it replaces (shuffle = write + network + sort of
  the same bytes).
- The persisted-index lifecycle (build_bm25_index) still materializes the
  full postings table once — that is the index's job; queries against it
  prune by term bucket.
- Ranking windows partition by q_id — parallel across queries, and each
  query's candidate set is bounded by its matched postings.
- Ranks are computed over the ROUNDED score (4 dp, +1e-9 nudge) with doc
  id as the tie-break, so exact-duplicate documents (equal scores up to
  summation order) order identically on any engine — the determinism
  discipline the ANN queries use, strengthened for a corpus that DOES
  contain exact duplicates.

No counterpart in the reference repo (its retrieval lives in ClickHouse /
Power BI aggregations); this is part of the LLM-pipeline extension surface
(SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import tokens
from .cachereg import track as _persist

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

#: session-scoped scoring-postings cache, ONE (corpus, query-set) entry
#: pinned at a time — the same contract as the dedup operators' shingle
#: cache: callers pass a cache_key identifying the corpus (e.g. its path)
#: and MUST change it when the data changes. Since r12 the cached
#: artifact is the QUERY-FILTERED aggregated postings (plus the 1-row
#: corpus stats), so the key also carries the query plan's semantic hash
#: — a different query set rebuilds instead of silently reusing the wrong
#: term subset. The semantic hash identifies the query PLAN, not its
#: data: an external query table re-read from the same path with changed
#: contents hashes identically, so the cache_key contract covers query
#: data too — bump cache_key whenever corpus OR query bytes change
#: (ADVICE r12).
_POSTINGS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _query_plan_key(queries: DataFrame) -> int | None:
    """Stable identity for the query set: the analyzed plan's semantic
    hash (alias/id renumbering-insensitive). None (no caching) when the
    backend does not expose it — fail closed to correctness."""
    try:
        return int(queries._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        return None


def clear_postings_cache() -> None:
    for k in list(_POSTINGS_CACHE):
        p, s = _POSTINGS_CACHE.pop(k)
        p.unpersist(blocking=True)
        s.unpersist(blocking=True)


def bm25_postings(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf) postings via one explode + one hash aggregate.
    Empty/whitespace-only docs contribute no postings (they can never
    match a query term, and dl derives from postings)."""
    return (
        corpus.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .select("doc_id", F.explode("_toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_token_stream(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, dl, term) exploded token rows, dl computed NARROWLY as the
    size of the filtered token array — no shuffle. Feeding this through a
    term semi-filter before the tf aggregate is the direct scoring path's
    whole trick: the only shuffle then carries query-matched tokens."""
    toks = F.filter(tokens(text_col), lambda t: t != "")
    return (
        corpus.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
    )


def bm25_doc_stats(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """1-row (n_docs, avgdl) over docs with at least one token, from a
    narrow scan of the text column (dl values are the same integers the
    postings-sum derivation produced, so avgdl is bit-identical).

    Determinism contract (ADVICE r12): this re-scans the corpus
    independently of the token stream that builds the filtered postings,
    so the corpus source must be DETERMINISTIC across actions (parquet
    reads, deterministic filters — everything the catalog passes). A
    nondeterministic source (``sample()``, a ``rand()`` filter) could
    yield stats that disagree with the postings; materialize such a
    source first."""
    dl = F.size(F.filter(tokens(text_col), lambda t: t != ""))
    return (
        corpus.select(dl.alias("dl"))
        .filter(F.col("dl") > 0)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    )


def _score(postings: DataFrame, doclen: DataFrame, stats: DataFrame,
           query_terms: DataFrame, k: int, k1: float, b: float,
           exclude_self: bool = True) -> DataFrame:
    """Shared scoring tail: semi-filter postings by the (broadcast) query
    terms, derive per-term document frequency with a window OVER the
    term-partitioned surviving postings (reuses the one term shuffle — no
    separate df aggregate + join-back), aggregate per (q_id, doc), rank
    per query on the rounded score. ``exclude_self`` drops candidates
    whose doc_id equals the query's q_id (right for corpus-as-queries
    similarity; wrong for external query sets whose id namespace is
    unrelated — see the public wrappers)."""
    q_terms = broadcast(query_terms)
    n_avg = stats  # (n_docs long, avgdl double) — 1 row
    surviving = postings.join(
        broadcast(query_terms.select("term").distinct()), "term"
    )
    w_term = Window.partitionBy("term")
    with_idf = (
        surviving.withColumn("df", F.count(F.lit(1)).over(w_term))
        .crossJoin(broadcast(n_avg))
        .withColumn(
            "idf",
            F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
    )
    matched = with_idf.join(q_terms, "term").join(doclen, "doc_id")
    if exclude_self:
        matched = matched.filter(F.col("doc_id") != F.col("q_id"))
    tf = F.col("tf").cast("double")
    tf_norm = (tf * (k1 + 1.0)) / (
        tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = matched.groupBy("q_id", "doc_id").agg(
        F.sum(F.col("idf") * tf_norm).alias("_raw")
    )
    scored = scored.withColumn("score", F.round(F.col("_raw") + 1e-9, 4))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("doc_id").alias("n_id"), "score", "rank")
    )


def _score_inline(postings_q: DataFrame, stats: DataFrame, query_terms: DataFrame,
                  k: int, k1: float, b: float, exclude_self: bool) -> DataFrame:
    """Scoring tail for the direct path: ``postings_q`` is already
    query-term-filtered and carries dl per row, so there is no doclen
    join and no separate semi-filter — df comes from one window over the
    term-partitioned filtered postings, then aggregate + rank as in
    :func:`_score`."""
    w_term = Window.partitionBy("term")
    with_idf = (
        postings_q.withColumn("df", F.count(F.lit(1)).over(w_term))
        .crossJoin(broadcast(stats))
        .withColumn(
            "idf",
            F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
    )
    matched = with_idf.join(broadcast(query_terms), "term")
    if exclude_self:
        matched = matched.filter(F.col("doc_id") != F.col("q_id"))
    tf = F.col("tf").cast("double")
    tf_norm = (tf * (k1 + 1.0)) / (
        tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = matched.groupBy("q_id", "doc_id").agg(
        F.sum(F.col("idf") * tf_norm).alias("_raw")
    )
    scored = scored.withColumn("score", F.round(F.col("_raw") + 1e-9, 4))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("doc_id").alias("n_id"), "score", "rank")
    )


def bm25_score_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """BM25 top-k per query, computed directly from the corpus (see
    module docstring for the formula and posture).

    Returns (q_id, n_id, score, rank) with rank 1..k per q_id; score is
    rounded to 4 dp and rank is computed over the rounded score with n_id
    as the tie-break (total order, engine-independent).

    ``exclude_self=True`` (default) drops candidates with doc_id == q_id —
    the right semantics when the queries ARE corpus documents (near-dup /
    related-doc retrieval, this engine's primary use). For an EXTERNAL
    query set whose id namespace is unrelated to doc ids (e.g. both
    auto-increment from 0), pass ``exclude_self=False`` or a colliding id
    silently loses one legitimate candidate.

    Corpus-stats contract (shared with the indexed path): n_docs/avgdl
    count documents WITH at least one token; empty/whitespace-only docs
    contribute no postings and are excluded from the stats on every path.

    Plan shape (r12 — guide §2.3/§2.4 "shuffle fewer bytes / aggregate
    after filtering"): the query terms broadcast-semi-filter the exploded
    token stream BEFORE the tf aggregate, so the path's one real shuffle
    carries only query-matched tokens instead of the full corpus token
    stream; dl rides each row narrowly and (n_docs, avgdl) come from a
    second narrow scan — the old full-postings aggregate + doclen shuffle
    + doclen join are gone. Results are identical: tf/dl/df/n_docs/avgdl
    are the same integers, so the scores agree bit-for-bit before the
    shared 4 dp rounding.

    ``cache_key`` (the corpus identity, e.g. its path) lets several
    queries over the same corpus AND the same query set (hybrid RRF's
    sparse leg) share one filtered-postings build; the cache key includes
    the query plan's semantic hash, so a different query set rebuilds."""
    query_terms = (
        queries.select(F.col(id_col).alias("q_id"), tokens(text_col).alias("_toks"))
        .select("q_id", F.explode(F.array_distinct("_toks")).alias("term"))
        .filter(F.col("term") != "")
    )
    qkey = _query_plan_key(queries) if cache_key is not None else None
    cached = (
        _POSTINGS_CACHE.get((cache_key, id_col, text_col, qkey))
        if qkey is not None
        else None
    )
    if cached is not None:
        postings_q, stats = cached
    else:
        postings_q = (
            bm25_token_stream(corpus, id_col, text_col)
            .join(broadcast(query_terms.select("term").distinct()), "term")
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
        )
        stats = bm25_doc_stats(corpus, id_col, text_col)
        if qkey is not None:
            postings_q = postings_q.persist()
            stats = stats.persist()
            # pin exactly ONE (corpus, query-set) entry: evict everything
            # that is not the entry being installed — including same-corpus
            # entries with a different query-set hash, which previously
            # accumulated as persisted DataFrames until
            # clear_postings_cache() (ADVICE r12)
            new_key = (cache_key, id_col, text_col, qkey)
            for old in [kk for kk in _POSTINGS_CACHE if kk != new_key]:
                p, s = _POSTINGS_CACHE.pop(old)
                p.unpersist(blocking=True)
                s.unpersist(blocking=True)
            _POSTINGS_CACHE[new_key] = (postings_q, stats)
        # no cache: postings_q has exactly one downstream consumer (the
        # df window chain), so persisting it would be pure overhead
    return _score_inline(postings_q, stats, query_terms, k, k1, b, exclude_self)


def build_bm25_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_buckets: int = 64,
) -> dict:
    """Persist the BM25 index: `{path}/postings` (term-hash-bucketed so a
    query's terms prune to their buckets), `{path}/doclen`, and
    `{path}/meta` (n_docs, avgdl). The one tokenize scan a corpus ever
    pays for lexical retrieval; queries afterwards read only postings
    buckets their terms hash into.

    doclen is the index's id REGISTRY: every corpus doc gets a row, with
    dl=0 for empty/whitespace-only docs (so the append path's replay
    guard sees them). The meta stats (n_docs, avgdl) count only docs with
    dl>0 — the same population the direct :func:`bm25_score_topk` path
    derives from postings — so build, append, and direct scoring all
    agree even when the corpus contains token-less docs."""
    postings = bm25_postings(corpus, id_col, text_col).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
    )
    # one shuffle partition per bucket: each task writes exactly its own
    # bucket dir — term_buckets files total, not tasks x buckets tiny files
    # (at 100 TB, raise term_buckets instead of letting files multiply)
    postings.repartition(term_buckets, "term_bucket").write.partitionBy(
        "term_bucket"
    ).mode("overwrite").parquet(f"{path}/postings")
    spark = corpus.sparkSession
    ids = (
        corpus.select(F.col(id_col).alias("doc_id"))
        .filter(F.col("doc_id").isNotNull())
        .dropDuplicates(["doc_id"])
    )
    doclen = (
        ids.join(
            spark.read.parquet(f"{path}/postings")
            .groupBy("doc_id")
            .agg(F.sum("tf").alias("dl")),
            "doc_id",
            "left",
        )
        .select("doc_id", F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    doclen.write.mode("overwrite").parquet(f"{path}/doclen")
    stats = (
        spark.read.parquet(f"{path}/doclen")
        .filter(F.col("dl") > 0)  # stats population: docs with tokens
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
        .withColumn("term_buckets", F.lit(term_buckets))
    )
    stats.write.mode("overwrite").parquet(f"{path}/meta")
    row = spark.read.parquet(f"{path}/meta").collect()[0]  # 1 row: index meta
    return {"n_docs": int(row["n_docs"]), "avgdl": float(row["avgdl"]),
            "term_buckets": int(row["term_buckets"])}


def append_to_bm25_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental-ingest leg of the BM25 lifecycle (parity with the
    dedup/IVF/IVF-PQ appends): tokenize an arriving batch, append its
    postings into the term-bucketed layout and its lengths into doclen,
    then rewrite the (1-row) meta with the new corpus stats — cost ∝
    batch; history is never re-tokenized.

    Replay guard: doc ids already present in ``doclen`` are skipped (the
    doclen table is the index's id registry — one row per doc, so the
    anti-join probes a compact table instead of the postings, whose rows
    for one doc scatter across every term bucket); ids repeated WITHIN
    the batch collapse first. At-least-once retries converge, and the
    appended index answers queries identically to a fresh build over the
    union (BM25 has no trained state — unlike the ANN lifecycles there
    is no drift caveat: idf/avgdl are recomputed exactly from the
    appended tables). Token-less docs register in doclen with dl=0 —
    registry rows only; like the build path, meta stats count docs with
    dl>0, so an empty doc in a batch never shifts n_docs/avgdl.

    Crash posture: doclen is the COMMIT marker (written after postings),
    so a crash between the two writes leaves duplicated postings rows on
    retry — the indexed read path dedupes (doc, term) defensively
    (duplicates are byte-identical, so max(tf) restores exact state),
    and meta is recomputed unconditionally on EVERY append (so a crash
    after doclen but before meta also self-heals on the next call).
    Returns {n_batch, n_appended, n_replayed}."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]  # 1 row
    n_buckets = int(meta["term_buckets"])
    src = (
        batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
        .filter(F.col("doc_id").isNotNull() & F.col("_text").isNotNull())
        .dropDuplicates(["doc_id"])
    )
    existing = spark.read.parquet(f"{path}/doclen").select("doc_id")
    fresh = src.join(existing, "doc_id", "left_anti").persist()
    try:
        n_batch = src.count()
        n_new = fresh.count()
        if n_new:
            # batch-local postings: doclen derives from THESE rows, never
            # from a re-read of the stored table (a crash-retry may have
            # duplicated stored rows; batch-local stays exact)
            postings = _persist(
                bm25_postings(fresh, "doc_id", "_text").withColumn(
                    "term_bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
                )
            )
            (
                postings.repartition(n_buckets, "term_bucket")
                .write.partitionBy("term_bucket")
                .mode("append")
                .parquet(f"{path}/postings")
            )
            # a doc with no non-empty tokens has no postings but must
            # still register in doclen (the id registry) with dl=0
            doclen_new = (
                fresh.select("doc_id")
                .join(
                    postings.groupBy("doc_id").agg(F.sum("tf").alias("dl")),
                    "doc_id",
                    "left",
                )
                .select("doc_id", F.coalesce("dl", F.lit(0)).alias("dl"))
            )
            doclen_new.write.mode("append").parquet(f"{path}/doclen")
        # meta self-heal: recomputed from doclen on every call, even a
        # fully-replayed one (closes the doclen-written/meta-stale window)
        stats = (
            spark.read.parquet(f"{path}/doclen")
            .filter(F.col("dl") > 0)  # stats population: docs with tokens
            .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
            .withColumn("term_buckets", F.lit(n_buckets))
            .collect()  # 1 row — sever lineage before overwriting meta
        )
        spark.createDataFrame(
            stats, "n_docs long, avgdl double, term_buckets int"
        ).write.mode("overwrite").parquet(f"{path}/meta")
    finally:
        fresh.unpersist(blocking=True)
    return {
        "n_batch": int(n_batch),
        "n_appended": int(n_new),
        "n_replayed": int(n_batch - n_new),
    }


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_self: bool = True,
) -> DataFrame:
    """Query a :func:`build_bm25_index` index. The query terms' hash
    buckets become an IN-list filter on the postings partition column —
    partition pruning for text — before the shared scoring tail runs.
    Equivalent to :func:`bm25_score_topk` on the indexed corpus,
    including the ``exclude_self`` contract (candidates with doc_id ==
    q_id are dropped by default; pass False for external query sets whose
    id namespace can collide with doc ids)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]  # 1 row
    n_buckets = int(meta["term_buckets"])
    query_terms = (
        queries.select(F.col(id_col).alias("q_id"), tokens(text_col).alias("_toks"))
        .select("q_id", F.explode(F.array_distinct("_toks")).alias("term"))
        .filter(F.col("term") != "")
    )
    # bounded collect: distinct term buckets of the (small) query set
    buckets = sorted(
        r["b"]
        for r in query_terms.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b")
        ).distinct().collect()
    )
    # defensive (doc, term) dedupe: a crashed-and-retried append may have
    # duplicated postings rows (byte-identical); max(tf) restores exact
    # state and is a no-op on a clean index — see append_to_bm25_index's
    # crash posture
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .groupBy("doc_id", "term")
        .agg(F.max("tf").alias("tf"))
    )
    doclen = spark.read.parquet(f"{path}/doclen")
    stats = spark.createDataFrame(
        [(int(meta["n_docs"]), float(meta["avgdl"]))], "n_docs long, avgdl double"
    )
    return _score(postings, doclen, stats, query_terms, k, k1, b, exclude_self)
