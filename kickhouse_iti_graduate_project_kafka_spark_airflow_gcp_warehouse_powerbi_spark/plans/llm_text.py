"""Training-data text-pipeline plans over the `documents` table.

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), token statistics,
quality scoring, language ID, fingerprinting — the LLM-data extensions from
the project brief (SURVEY.md §7 step 7), each expressed Spark-first with a
DuckDB oracle where SQL can express the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.text import (
    EN_STOPWORDS_PATTERN,
    fingerprint64,
    lang_guess,
    quality_score,
    stopword_count,
    token_count,
)
from ..operators.dedup import (
    duplicate_span_stats,
    minhash_lsh_pairs,
    jaccard_pairs_cached,
    remove_duplicate_spans,
    remove_overlap_spans,
    simhash_pairs,
)
from ..sources.tables import load_table

#: shared DuckDB CTE producing distinct 3-word shingle sets per doc
_DUCKDB_SHINGLES = r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
               list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t WHERE len(toks) >= 3
    )
"""

_DUCKDB_JACCARD_PAIRS = (
    _DUCKDB_SHINGLES
    + """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           ROUND(LEN(list_intersect(a.sh, b.sh)) * 1.0
                 / LEN(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE LEN(list_intersect(a.sh, b.sh)) * 1.0
          / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
"""
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every consumer in this module runs regex/tokenization per document —
    # CPU-bound narrow stages that a one-row-group table would serialize
    # on one core; broadcast-small inputs are re-spread first (no-op at
    # real scale — see operators/spread.py)
    from ..operators.spread import spread_for_cpu

    return spread_for_cpu(load_table(spark, sf_dir, "documents"))


@register(
    "docs_exact_dedup_stats",
    tags=("dedup", "A1"),
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT LOWER(TRIM(text))) AS n_unique,
           COUNT(*) - COUNT(DISTINCT LOWER(TRIM(text))) AS n_dupes
    FROM documents GROUP BY source
    """,
)
def docs_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup statistics per source via 64-bit fingerprints. The oracle
    counts distinct normalized texts; equality holds iff fingerprint64 is
    collision-free on the corpus — the invariant exact_dedup depends on."""
    d = _docs(spark, sf_dir).withColumn("fp", fingerprint64("text"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_unique"),
        (F.count(F.lit(1)) - F.count_distinct("fp")).alias("n_dupes"),
    )


@register(
    "docs_token_stats",
    bench=True,
    tags=("text", "A4"),
    oracle=r"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(LEN(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS total_tokens,
           CAST(SUM(LEN(string_split_regex(trim(text), '\s+'))) AS BIGINT) * 1.0
               / COUNT(*) AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) * 1.0 / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) aggregated per language —
    the 'how big is this corpus really' primitive."""
    d = _docs(spark, sf_dir).withColumn("n_tok", token_count("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.sum("n_tok") * 1.0 / F.count(F.lit(1))).alias("avg_tokens"),
        (F.sum("n_chars") * 1.0 / F.count(F.lit(1))).alias("avg_chars"),
    )


@register(
    "docs_bpe_token_counts",
    tags=("text", "A4"),
    oracle=r"""
    SELECT lang,
           CAST(SUM(LEN(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT)
               AS bpe_tokens,
           CAST(SUM(LEN(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS ws_tokens,
           CAST(SUM(LEN(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) * 1.0
               / CAST(SUM(LEN(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS tokens_per_word
    FROM documents GROUP BY lang
    """,
)
def docs_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: the GPT-2-style pre-tokenizer regex
    (word runs + single non-space punctuation) vs the whitespace tokenizer —
    the cheap 'how many tokens will this cost' estimator, per language.
    Both engines use ASCII \\w so the counts agree exactly."""
    d = _docs(spark, sf_dir)
    bpe = F.regexp_count("text", F.lit(r"\w+|[^\w\s]")).cast("long")
    return (
        d.select("lang", bpe.alias("b"), token_count("text").alias("w"))
        .groupBy("lang")
        .agg(
            F.sum("b").alias("bpe_tokens"),
            F.sum("w").alias("ws_tokens"),
            (F.sum("b") * 1.0 / F.sum("w")).alias("tokens_per_word"),
        )
    )


@register(
    "docs_quality_scores",
    tags=("text", "A3"),
    oracle=r"""
    WITH m AS (
        SELECT doc_id,
               LEN(string_split_regex(trim(text), '\s+')) AS n_tok,
               LEN(regexp_extract_all(LOWER(text), '\b(the|a|of|to|and)\b'))
                   AS n_stop
        FROM documents
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(n_stop AS BIGINT) AS n_stopwords,
           CAST(ROUND(
               (CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.0 END)
               + (CASE WHEN n_stop * 1.0 / n_tok BETWEEN 0.01 AND 0.5
                       THEN 0.5 ELSE 0.0 END), 2) AS DOUBLE) AS quality
    FROM m
    """,
)
def docs_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristic (length band + stopword-ratio band) —
    the standard shape of pretraining quality filters; all JVM-side regex."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        stopword_count("text", EN_STOPWORDS_PATTERN).alias("n_stopwords"),
        quality_score("text").alias("quality"),
    )


@register(
    "docs_decontaminate_rewrite",
    tags=("dedup", "contamination", "spans"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(toks, i, i + 4), ' ') AS gram
        FROM t, UNNEST(range(1, len(toks) - 3)) AS u(i)
    ), ev AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0
    ), nc AS (
        SELECT g.doc_id, g.pos FROM g JOIN ev USING (gram)
        WHERE g.doc_id % 20 <> 0
    ), rem AS (
        SELECT DISTINCT doc_id, rp
        FROM nc, UNNEST(range(pos, pos + 5)) AS r(rp)
    ), ragg AS (
        SELECT doc_id, COUNT(*) AS removed, list(rp) AS rps
        FROM rem GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(r.removed, 0) AS BIGINT) AS removed_tokens,
           COALESCE(array_to_string(
               [t.toks[i] for i in range(1, len(t.toks) + 1)
                if NOT list_contains(COALESCE(r.rps, CAST([] AS BIGINT[])), i)],
               ' '), '') AS cleaned_text
    FROM t LEFT JOIN ragg r ON t.doc_id = r.doc_id
    WHERE t.doc_id % 20 <> 0
    """,
)
def docs_decontaminate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination as SURGERY (operators/dedup.py:
    remove_overlap_spans): every 5-token run of a train doc that also
    appears in the held-out 'benchmark' split (doc_id % 20 == 0, the same
    deterministic split docs_contamination measures) is excised and the
    doc re-emitted — one leaked benchmark sentence costs ~5 tokens, not
    the whole document. The oracle replays gram matching, interval union
    and the positional token filter, so the hash match covers the
    rebuilt text bytes."""
    docs = _docs(spark, sf_dir)
    return remove_overlap_spans(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        "text",
        "doc_id",
        l=5,
    )


@register(
    "docs_quality_classifier",
    tags=("text", "classifier", "A3"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(trim(text), '\s+'),
                   x -> x != '')) AS terms
        FROM documents
    ), f AS (
        SELECT doc_id, unnest(terms) AS term FROM t
    ), w AS (
        SELECT doc_id,
               ((CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 1024)
                * 2654435761) % 1001 - 500 AS wt
        FROM f
    ), s AS (
        SELECT doc_id, COUNT(*) AS n_terms, SUM(wt) AS score FROM w
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(s.n_terms, 0) AS BIGINT) AS n_terms,
           CAST(COALESCE(s.score, 0) AS BIGINT) AS score_milli,
           ROUND(CASE WHEN COALESCE(s.n_terms, 0) = 0 THEN 0.5
                      ELSE 1.0 / (1.0 + EXP(-(CAST(s.score AS DOUBLE)
                                              / (1000.0 * s.n_terms))))
                 END + 1e-9, 6) AS prob,
           COALESCE(s.score, 0) >= 0 AS keep
    FROM t LEFT JOIN s ON t.doc_id = s.doc_id
    """,
)
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the fastText/CCNet-style linear
    classifier stage, as pure DataFrame algebra: hashed bag-of-words
    features (md5 bucket of each DISTINCT token, 1024 buckets —
    engine-portable, same contract as the sampling ops), an integer
    weight per bucket, exact integer score sum, sigmoid probability, and
    a keep decision taken on the EXACT integer score (sign test — the
    float sigmoid never feeds the decision, so there is no
    summation-order boundary hazard).

    The closed-form weight ``w(b) = (b * 2654435761) % 1001 - 500``
    stands in for learned weights; in production the weight table is a
    broadcast join (2^20 rows) instead of an expression — every other
    part of the plan (explode distinct terms, map-side-combined per-doc
    integer aggregate, narrow sigmoid projection) is the real 100 TB
    shape: one doc-keyed partial aggregate, no corpus-wide shuffle of
    anything but (doc_id, 8-byte term hash). Implementation:
    operators/quality.py (reused as the curation job's quality gate)."""
    from ..operators.quality import hashed_quality_scores

    return hashed_quality_scores(_docs(spark, sf_dir), "text", "doc_id")


@register(
    "docs_bigram_logprob",
    tags=("text", "lm", "A4"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x != '') AS tk
        FROM documents
    ), bg AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM t, UNNEST(range(1, len(tk))) AS u(i)
    ), c12 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
    ), v AS (
        SELECT COUNT(DISTINCT x) AS v
        FROM (SELECT unnest(tk) AS x FROM t)
    ), s AS (
        SELECT bg.doc_id, COUNT(*) AS n_bigrams,
               SUM(LN(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + v.v))) AS lp
        FROM bg
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN v
        GROUP BY bg.doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           ROUND(COALESCE(s.lp / s.n_bigrams, 0.0) + 1e-9, 6) AS avg_logprob
    FROM t LEFT JOIN s ON t.doc_id = s.doc_id
    """,
)
def docs_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring (CCNet shape): an add-one-smoothed
    bigram language model is fit on the corpus ITSELF (exact integer
    counts — C(w1,w2), predecessor counts C(w1), vocabulary size V), and
    each document is scored by its mean bigram log-probability
    ln((C12+1)/(C1+V)). Low scores flag machine-generated/abnormal word
    sequences the unigram heuristics miss.

    Plan: one per-doc lead window builds the bigram stream; the model is
    two hash aggregates over it (vocab²-bounded — broadcastable at any
    corpus scale) plus a 1-row vocabulary scalar; scoring joins the
    stream back to the model and reduces per doc. Only (doc_id, word,
    word) pairs ever shuffle — never text. Docs with fewer than two
    tokens score (0, 0.0)."""
    from ..functions.text import tokens as _tokens

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", _tokens("text").alias("_tk"))
    flat = toks.select("doc_id", F.posexplode("_tk").alias("_pos", "_w")).filter(
        F.col("_w") != ""
    )
    w_doc = Window.partitionBy("doc_id").orderBy("_pos")
    bg = (
        flat.withColumn("_w2", F.lead("_w", 1).over(w_doc))
        .filter(F.col("_w2").isNotNull())
        .select("doc_id", F.col("_w").alias("w1"), F.col("_w2").alias("w2"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = flat.agg(F.count_distinct("_w").alias("v"))
    scored = (
        bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.log((F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v")))
            ).alias("lp"),
        )
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("lp") / F.col("n_bigrams"), F.lit(0.0)) + 1e-9, 6
            ).alias("avg_logprob"),
        )
    )


@register(
    "docs_lang_guess_confusion",
    tags=("text", "A1"),
    oracle=r"""
    WITH g AS (
        SELECT lang,
               CASE
                 WHEN LEN(regexp_extract_all(LOWER(text),
                      '\b(the|of|and|to|in)\b')) >= 2 THEN 'en'
                 WHEN LEN(regexp_extract_all(LOWER(text),
                      '\b(le|la|les|et|des)\b')) >= 2 THEN 'fr'
                 WHEN LEN(regexp_extract_all(LOWER(text),
                      '\b(der|die|das|und|nicht)\b')) >= 2 THEN 'de'
                 WHEN LEN(regexp_extract_all(LOWER(text),
                      '\b(el|los|las|y|una)\b')) >= 2 THEN 'es'
                 WHEN LEN(regexp_extract_all(LOWER(text), '[一-鿿]')) >= 2
                      THEN 'zh'
                 ELSE 'und' END AS guessed
        FROM documents
    )
    SELECT lang, guessed, COUNT(*) AS n FROM g GROUP BY lang, guessed
    """,
)
def docs_lang_guess_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language-ID heuristic vs the labeled lang column —
    a confusion matrix. (The fixture corpus is synthetic English-ish text,
    so the value is the determinism of the heuristic, not its accuracy.)"""
    d = _docs(spark, sf_dir).withColumn("guessed", lang_guess("text"))
    return d.groupBy("lang", "guessed").agg(F.count(F.lit(1)).alias("n"))


@register(
    "docs_ngram_jaccard_pairs",
    bench=True,
    tags=("dedup", "J4"),
    oracle=_DUCKDB_JACCARD_PAIRS,
)
def docs_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs at 3-gram Jaccard >= 0.5 via the inverted-index
    operator (no N^2 cross join; see operators/dedup.py)."""
    pairs = jaccard_pairs_cached(
        _docs(spark, sf_dir), "text", "doc_id", n=3, threshold=0.5,
        cache_key=sf_dir,
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 4).alias("jaccard"))


@register(
    "docs_minhash_lsh_pairs",
    bench=True,
    tags=("dedup", "ST-scale"),
    oracle=_DUCKDB_JACCARD_PAIRS,
)
def docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands of 4) candidates, exact-Jaccard-verified at
    >= 0.5. The oracle is the exact pair set: with the fixture's planted
    near-dups at j>=0.9, per-pair miss probability is < 2e-9, so LSH output
    equals the exact answer. This is the 100 TB dedup path."""
    pairs = minhash_lsh_pairs(
        _docs(spark, sf_dir), "text", "doc_id", n=3, threshold=0.5,
        num_hashes=64, band_size=4, cache_key=sf_dir,
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 4).alias("jaccard"))


# one-way import: curation never imports llm_text (see its module header)
from .curation import (  # noqa: E402 — needs _DUCKDB_JACCARD_PAIRS above
    _docs_sampled,
    sampled_oracle as _sampled_oracle,
    sweep_sample_key as _sweep_key,
)


@register(
    "docs_ngram_jaccard_pairs_sampled",
    tags=("dedup", "J4", "sweep-sampled"),
    oracle=_sampled_oracle(_DUCKDB_JACCARD_PAIRS),
)
def docs_ngram_jaccard_pairs_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_ngram_jaccard_pairs restricted to the deterministic,
    scale-adaptive md5-bucket document sample (plans/curation
    sampled_oracle contract — 4% capped at a constant sampled-doc count
    so the quadratic oracle stays inside the sweep watchdog at ANY
    fixture size): the all-pairs oracle is quadratic by design, so this
    variant is what gives the inverted-index pair generator a DIRECT
    oracle row in the sweeps (tools/oracle_sweep.py) instead of an
    invariant companion."""
    docs = _docs_sampled(spark, sf_dir)
    pairs = jaccard_pairs_cached(
        docs, "text", "doc_id", n=3, threshold=0.5,
        cache_key=_sweep_key(sf_dir),
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 4).alias("jaccard"))


@register(
    "docs_minhash_lsh_pairs_sampled",
    tags=("dedup", "ST-scale", "sweep-sampled"),
    oracle=_sampled_oracle(_DUCKDB_JACCARD_PAIRS),
)
def docs_minhash_lsh_pairs_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_minhash_lsh_pairs over the deterministic scale-adaptive
    sample — the MinHash+LSH banding path with a direct exact-pair
    oracle at sweep scale (same per-pair miss bound as the full query).

    Scope of the equality claim (r13 finding): the < 2e-9 miss bound
    holds for the fixture's PLANTED near-dups (j >= 0.9). A fixture that
    also creates borderline pairs — the skewed generator's injected hot
    phrase yields pairs at j ≈ 0.5–0.6, where P[candidate] =
    1-(1-j^4)^16 ≈ 0.65–0.9 — can legitimately show the exact-pair
    oracle ahead by those pairs (observed at sf1_skew: 2 missed pairs at
    j = 0.5714/0.6087, zero false positives, reproduced identically on
    two code revisions). That is the documented probabilistic recall of
    LSH, not an engine defect; read skew-sweep rows for this twin
    accordingly."""
    docs = _docs_sampled(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5,
        num_hashes=64, band_size=4, cache_key=_sweep_key(sf_dir),
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 4).alias("jaccard"))


@register(
    "docs_simhash_pairs",
    tags=("dedup",),
    oracle=None,  # simhash bit votes are hash-specific; driver rows-only check
)
def docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at Hamming distance <= 3 (banded candidate
    join, pigeonhole-exact recall). No SQL oracle: the bit votes depend on
    xxhash64; covered by unit tests asserting the planted near-dups are
    found and determinism holds."""
    return simhash_pairs(
        _docs(spark, sf_dir), "text", "doc_id", n=3, max_hamming=3, cache_key=sf_dir
    )


@register(
    "simhash_containment",
    tags=("dedup", "invariant"),
    oracle="SELECT TRUE AS has_pairs, CAST(0 AS BIGINT) AS n_violations",
)
def simhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariant for the hash-specific SimHash operator:
    every Hamming<=3 pair must also be an exact n-gram-Jaccard>=0.5 pair
    (Hamming 3/64 is far stricter than Jaccard 0.5), and the pair set must
    be non-empty (non-vacuous). The oracle states the expected invariant
    (TRUE, 0); the Spark side EARNS it — any simhash false positive or a
    dried-up candidate generator breaks the hash match."""
    docs = _docs(spark, sf_dir)
    sim = simhash_pairs(
        docs, "text", "doc_id", n=3, max_hamming=3, cache_key=sf_dir
    ).select("a_id", "b_id")
    exact = jaccard_pairs_cached(
        docs, "text", "doc_id", threshold=0.5, cache_key=sf_dir
    ).select("a_id", "b_id")
    violations = sim.join(exact, ["a_id", "b_id"], "left_anti")
    return (
        sim.agg(F.count(F.lit(1)).alias("_np"))
        .crossJoin(violations.agg(F.count(F.lit(1)).alias("_nv")))
        .select(
            (F.col("_np") >= 1).alias("has_pairs"),
            F.col("_nv").alias("n_violations"),
        )
    )


#: redaction patterns (Java-regex and RE2 compatible — no lookbehind):
#: email / long digit runs (classic PII) + a configurable denylist of terms
_REDACT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_REDACT_DIGITS = r"\d{6,}"
_REDACT_DENYLIST = r"\b(key|hash|secret)\b"


@register(
    "docs_redaction_stats",
    tags=("text", "cleaning"),
    oracle=rf"""
    WITH m AS (
        SELECT lang,
               LEN(regexp_extract_all(text, '{_REDACT_EMAIL}')) AS n_email,
               LEN(regexp_extract_all(text, '{_REDACT_DIGITS}')) AS n_digit,
               LEN(regexp_extract_all(text, '{_REDACT_DENYLIST}')) AS n_deny,
               LEN(regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_REDACT_EMAIL}', '[EMAIL]', 'g'),
                       '{_REDACT_DIGITS}', '[NUM]', 'g'),
                   '{_REDACT_DENYLIST}', '[TERM]', 'g')) AS clean_len,
               LEN(text) AS orig_len
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS email_hits,
           CAST(SUM(n_digit) AS BIGINT) AS digit_hits,
           CAST(SUM(n_deny) AS BIGINT) AS denylist_hits,
           CAST(SUM(orig_len) AS BIGINT) AS orig_chars,
           CAST(SUM(clean_len) AS BIGINT) AS clean_chars
    FROM m GROUP BY lang
    """,
)
def docs_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing pass: count and redact emails, long digit runs,
    and a denylist of sensitive terms; report per-language hit counts and
    the char-count delta. All JVM-side regexp_replace/regexp_count — a
    narrow map stage with zero shuffle beyond the final small aggregate
    (the 100 TB cleaning-pass shape). The fixture corpus contains no
    emails/digit-runs (those counts prove the negative path); the denylist
    fires on real tokens."""
    d = _docs(spark, sf_dir)
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _REDACT_EMAIL, "[EMAIL]"),
            _REDACT_DIGITS,
            "[NUM]",
        ),
        _REDACT_DENYLIST,
        "[TERM]",
    )
    return (
        d.select(
            "lang",
            F.regexp_count("text", F.lit(_REDACT_EMAIL)).alias("e"),
            F.regexp_count("text", F.lit(_REDACT_DIGITS)).alias("g"),
            F.regexp_count("text", F.lit(_REDACT_DENYLIST)).alias("y"),
            F.length("text").alias("o"),
            F.length(cleaned).alias("c"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").cast("long").alias("email_hits"),
            F.sum("g").cast("long").alias("digit_hits"),
            F.sum("y").cast("long").alias("denylist_hits"),
            F.sum("o").cast("long").alias("orig_chars"),
            F.sum("c").cast("long").alias("clean_chars"),
        )
    )


@register(
    "docs_top_terms",
    tags=("text", "A9"),
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM w GROUP BY term
    ORDER BY df DESC, term ASC LIMIT 20
    """,
)
def docs_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary extraction: top-20 terms by document frequency (ties
    broken lexicographically for determinism). explode -> one hash
    aggregate on the term -> TakeOrderedAndProject; the full vocabulary is
    never sorted, only the top-k heap per partition (the scale-safe top-k
    shape)."""
    d = _docs(spark, sf_dir)
    from ..functions.text import tokens

    return (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(20)
    )


@register(
    "docs_fingerprint_cardinality",
    tags=("dedup", "A10"),
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT LOWER(TRIM(text))) AS n_fingerprints,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    """,
)
def docs_fingerprint_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 64-bit fingerprint cardinality == distinct normalized texts
    (collision-freedom invariant on the corpus)."""
    d = _docs(spark, sf_dir).withColumn("fp", fingerprint64("text"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_fingerprints"),
        F.count_distinct("lang").alias("n_langs"),
    )


@register(
    "docs_source_overlap",
    tags=("dedup", "provenance", "J5"),
    oracle=r"""
    WITH fp AS (
        SELECT DISTINCT
               REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g') AS f,
               source
        FROM documents WHERE text IS NOT NULL
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content overlap — provenance analytics for a crawl
    mix: for every source pair, how many distinct normalized texts both
    carry (which crawls mirror each other, what a source adds
    marginally). Shuffles 8-byte fingerprints only, never text: distinct
    (fingerprint, source) pairs — at most |sources| rows per fingerprint
    — self-joined on the hash. The oracle applies fingerprint64's EXACT
    normalization (lower, trim, whitespace collapse, NULL text excluded —
    xxhash64(NULL) is a constant that would fabricate overlap) so
    equivalence is structural; collision-freedom of the hash itself is
    separately pinned by docs_fingerprint_cardinality."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull()).select(
        fingerprint64("text").alias("f"), "source"
    ).distinct()
    a = d.select(F.col("f"), F.col("source").alias("source_a"))
    b = d.select(F.col("f"), F.col("source").alias("source_b"))
    return (
        a.join(b, "f")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register(
    "docs_top_tfidf_terms",
    tags=("text", "A9"),
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents
    ), n AS (
        SELECT COUNT(DISTINCT doc_id) AS n_docs FROM w
    ), stats AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM w GROUP BY term
    )
    SELECT term, tf, df,
           ROUND(tf * ln(n_docs * 1.0 / df) + 1e-9, 4) AS tfidf
    FROM stats, n
    ORDER BY tfidf DESC, term ASC LIMIT 20
    """,
)
def docs_top_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF term scoring (tf x ln(N/df)), top-20 — the
    feature-weighting twin of docs_top_terms: high-frequency-but-ubiquitous
    terms (df ~ N) score ~0, distinctive terms rise. One explode + one
    aggregate; N arrives as a broadcast scalar (crossJoin of a 1-row agg),
    never a collect. Identical float op order both engines: tf * ln(N/df)."""
    d = _docs(spark, sf_dir)
    from ..functions.text import tokens

    w = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    n = w.agg(F.count_distinct("doc_id").alias("n_docs"))
    stats = w.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    return (
        stats.crossJoin(F.broadcast(n))
        .select(
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")) + 1e-9, 4
            ).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("term").asc())
        .limit(20)
    )


@register(
    "docs_chunk_windows",
    tags=("text", "chunking"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), starts AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 48)) AS s
        FROM t
    )
    SELECT doc_id,
           CAST((s - 1) / 48 AS BIGINT) AS chunk_id,
           CAST(LEN(toks[s : s + 63]) AS BIGINT) AS n_tok_chunk,
           md5(array_to_string(toks[s : s + 63], ' ')) AS chunk_md5
    FROM starts
    """,
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-prep chunking: overlapping 64-token windows every 48 tokens
    (16-token overlap), one row per chunk with an md5 of the reconstructed
    chunk text — the hash match proves BOTH engines slice identical
    windows, not just equal counts. Narrow plan: tokenize once, explode
    the start offsets, slice the token array per chunk; no shuffle until
    the driver's own comparison. (Array slicing is fine for web-scale docs
    of ~10^3 tokens; book-length corpora should switch to the row-based
    shingle machinery in operators/dedup.py.)"""
    from ..functions.text import tokens

    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    d = d.filter(F.size("toks") > 0).select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(48))).alias("s"),
    )
    chunk = F.slice("toks", F.col("s"), 64)
    return d.select(
        "doc_id",
        ((F.col("s") - 1) / 48).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tok_chunk"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_md5"),
    )


@register(
    "docs_dup_span_stats",
    bench=True,
    tags=("dedup", "text", "spans"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        FROM t, UNNEST(range(1, len(toks) - 6)) AS u(i)
    ), d AS (
        SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ), s AS (
        SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
    ), i1 AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS ni
        FROM s
    ), i2 AS (
        SELECT doc_id, pos, SUM(ni) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM i1
    ), cov AS (
        SELECT doc_id, island, MAX(pos) + 8 - MIN(pos) AS c
        FROM i2 GROUP BY doc_id, island
    ), per AS (
        SELECT doc_id, SUM(c) AS dup_tokens FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(per.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           ROUND(CASE WHEN len(t.toks) > 0
                      THEN COALESCE(per.dup_tokens, 0) * 1.0 / len(t.toks)
                      ELSE 0.0 END + 1e-9, 6) AS dup_frac
    FROM t LEFT JOIN per USING (doc_id)
    """,
)
def docs_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage (operators/dedup.py:
    duplicate_span_stats): fraction of each doc's tokens inside an 8-token
    run occurring >= 2 times corpus-wide — the Lee-et-al-style exact-dedup
    statistic that near-dup Jaccard does NOT capture (it scores whole
    docs; this scores repeated *passages*). The oracle rebuilds the same
    positional grams, duplicate index, and gaps-and-islands merge in SQL,
    so the hash match proves interval arithmetic end to end."""
    return duplicate_span_stats(_docs(spark, sf_dir), "text", "doc_id", l=8)


@register(
    "docs_dedup_span_rewrite",
    bench=True,
    tags=("dedup", "text", "spans"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        FROM t, UNNEST(range(1, len(toks) - 6)) AS u(i)
    ), nc AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY gram
                                      ORDER BY doc_id, pos) AS rn
            FROM g)
        WHERE rn > 1
    ), rem AS (
        SELECT DISTINCT doc_id, rp
        FROM nc, UNNEST(range(pos, pos + 8)) AS r(rp)
    ), ragg AS (
        SELECT doc_id, COUNT(*) AS removed, list(rp) AS rps
        FROM rem GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(r.removed, 0) AS BIGINT) AS removed_tokens,
           COALESCE(array_to_string(
               [t.toks[i] for i in range(1, len(t.toks) + 1)
                if NOT list_contains(COALESCE(r.rps, CAST([] AS BIGINT[])), i)],
               ' '), '') AS cleaned_text
    FROM t LEFT JOIN ragg r ON t.doc_id = r.doc_id
    """,
)
def docs_dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup REWRITE (operators/dedup.py:
    remove_duplicate_spans) — the removal half of the Lee-et-al recipe
    that docs_dup_span_stats only measures: each duplicated 8-token run
    keeps its first (doc_id, pos) occurrence and every other occurrence's
    tokens are excised; docs are re-emitted rebuilt from their original
    token arrays. The oracle replays the rank-1-survives rule and the
    positional token filter verbatim, so the hash match proves the
    rewrite end to end (including the rebuilt text bytes)."""
    return remove_duplicate_spans(_docs(spark, sf_dir), "text", "doc_id", l=8)


@register(
    "docs_repetition_signals",
    tags=("quality", "text", "repetition"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, 1 AS lvl, unnest(toks) AS gram FROM t
        UNION ALL
        SELECT doc_id, 2 AS lvl,
               unnest([toks[i] || ' ' || toks[i+1]
                       for i in range(1, len(toks))]) AS gram
        FROM t WHERE len(toks) >= 2
        UNION ALL
        SELECT doc_id, 3 AS lvl,
               unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       for i in range(1, len(toks) - 1)]) AS gram
        FROM t WHERE len(toks) >= 3
    ), c AS (
        SELECT doc_id, lvl, gram, COUNT(*) AS cnt
        FROM g GROUP BY doc_id, lvl, gram
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN lvl = 1 THEN cnt END) AS BIGINT) AS n_words,
           CAST(MAX(CASE WHEN lvl = 1 THEN cnt END) AS BIGINT) AS top_word_count,
           MAX(CASE WHEN lvl = 1 THEN cnt END) * 1.0
               / SUM(CASE WHEN lvl = 1 THEN cnt END) AS top_word_frac,
           CAST(MAX(CASE WHEN lvl = 2 THEN cnt END) AS BIGINT) AS top_bigram_count,
           MAX(CASE WHEN lvl = 2 THEN cnt END) * 1.0
               / SUM(CASE WHEN lvl = 2 THEN cnt END) AS top_bigram_frac,
           (SUM(CASE WHEN lvl = 3 THEN cnt END)
            - COUNT(CASE WHEN lvl = 3 THEN 1 END)) * 1.0
               / SUM(CASE WHEN lvl = 3 THEN cnt END) AS dup_trigram_frac
    FROM c GROUP BY doc_id
    """,
)
def docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality filters (Gopher-rule shape):
    fraction of words taken by the most frequent unigram / bigram, and the
    fraction of trigram occurrences that are repeats of an earlier trigram
    in the SAME doc. Complements docs_dup_span_stats, which scores
    corpus-wide repeated passages; these signals catch boilerplate-heavy or
    looping documents before any cross-doc comparison.

    Scale shape: gram arrays are built narrow inside each row (zip_with
    over slices — no window, no per-doc shuffle for gram construction),
    then exactly two keyed shuffles: partial-agg counts on
    (doc_id, lvl, gram) and the per-doc pivot on doc_id. Both keys are
    doc-bounded, so cost is linear in corpus tokens at any SF."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    empty = F.array().cast("array<string>")
    join2 = lambda a, b: F.concat_ws(" ", a, b)  # noqa: E731
    bi = F.when(
        n >= 2, F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1), join2)
    ).otherwise(empty)
    tri = F.when(
        n >= 3,
        F.zip_with(
            F.slice(toks, 1, n - 2),
            F.zip_with(F.slice(toks, 2, n - 2), F.slice(toks, 3, n - 2), join2),
            join2,
        ),
    ).otherwise(empty)
    tag = lambda arr, lvl: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(lvl).alias("lvl"), g.alias("gram"))
    )
    ex = d.select(
        "doc_id", F.explode(F.concat(tag(toks, 1), tag(bi, 2), tag(tri, 3))).alias("t")
    ).select("doc_id", F.col("t.lvl").alias("lvl"), F.col("t.gram").alias("gram"))
    counts = ex.groupBy("doc_id", "lvl", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    c1 = F.when(F.col("lvl") == 1, F.col("cnt"))
    c2 = F.when(F.col("lvl") == 2, F.col("cnt"))
    c3 = F.when(F.col("lvl") == 3, F.col("cnt"))
    return counts.groupBy("doc_id").agg(
        F.sum(c1).alias("n_words"),
        F.max(c1).alias("top_word_count"),
        (F.max(c1).cast("double") / F.sum(c1).cast("double")).alias("top_word_frac"),
        F.max(c2).alias("top_bigram_count"),
        (F.max(c2).cast("double") / F.sum(c2).cast("double")).alias("top_bigram_frac"),
        ((F.sum(c3) - F.count(c3)).cast("double") / F.sum(c3).cast("double")).alias(
            "dup_trigram_frac"
        ),
    )


@register(
    "docs_word_commonness",
    tags=("quality", "text", "corpus-stats"),
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
    ), dfreq AS (
        SELECT word, COUNT(DISTINCT doc_id) AS df
        FROM w GROUP BY word
    )
    SELECT w.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(dfreq.df) AS BIGINT) AS sum_df,
           CAST(SUM(dfreq.df) AS BIGINT) * 1.0 / COUNT(*) AS mean_df,
           CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax_occurrences,
           SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
               AS hapax_frac
    FROM w JOIN dfreq USING (word)
    GROUP BY w.doc_id
    """,
)
def docs_word_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality features: for each doc, the mean document
    frequency of its word occurrences (boilerplate-heavy docs score high)
    and the fraction of occurrences whose word appears in no other doc
    (hapax/rare-token ratio — a standard quality-classifier feature).

    Scale shape: one word-keyed aggregation for document frequency
    (count_distinct over (word, doc_id) — partial-combined, so stopword
    skew collapses map-side), then an occurrences-to-vocab join on word
    and a doc-keyed pivot. The vocab side is orders of magnitude smaller
    than occurrences (Heaps' law) — at this SF Spark broadcasts it; at
    100 TB it's a sort-merge on word where AQE's skew split handles the
    stopword keys. All aggregates are integer sums, so results are
    bitwise-stable under any partitioning."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    dfreq = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    joined = words.join(dfreq, "word")
    hapax = F.when(F.col("df") == 1, F.lit(1)).otherwise(F.lit(0))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("df").alias("sum_df"),
        (F.sum("df").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_df"
        ),
        F.sum(hapax).alias("n_hapax_occurrences"),
        (F.sum(hapax).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "hapax_frac"
        ),
    )


@register(
    "docs_unicode_normalize",
    tags=("text", "cleaning", "UDF", "unicode"),
    oracle=r"""
    WITH dirty AS (
        SELECT doc_id, lang,
               chr(1) || CASE WHEN doc_id % 3 = 0
                   THEN replace(replace(text, 'e', 'e' || chr(769)),
                                ' ', chr(160))
                   ELSE replace(text, 'e', 'e' || chr(769)) END AS t
        FROM documents
    ),
    norm AS (
        SELECT doc_id, lang,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(nfc_normalize(t), chr(1), '', 'g'),
                       chr(160), ' ', 'g'),
                   '\s+', ' ', 'g')) AS clean
        FROM dirty
    )
    SELECT doc_id, lang, md5(clean) AS clean_md5,
           CAST(LENGTH(clean) AS BIGINT) AS n_chars_clean
    FROM norm
    """,
)
def docs_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization — the ingest stage every LLM pipeline runs
    before tokenization: NFC composition (decomposed e+COMBINING ACUTE ->
    \u00e9), control-char stripping, exotic-whitespace mapping (NBSP ->
    space) and run collapsing, as ONE Arrow kernel pass
    (functions/textnorm.py; Spark has no NFC builtin). The fixture text
    is ASCII-clean, so the fabricate-then-parse discipline applies: a
    pure Column expression soils every doc deterministically, the oracle
    replays the identical soiling in SQL and normalizes with DuckDB's own
    nfc_normalize — the md5 of the cleaned BYTES matching across engines
    proves both normalizers agree character for character."""
    from ..functions.textnorm import fabricate_dirty_text, normalize_text_column

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    dirty = docs.withColumn("text", fabricate_dirty_text())
    out = normalize_text_column(dirty, "text", "clean")
    return out.select(
        "doc_id",
        "lang",
        F.md5("clean").alias("clean_md5"),
        F.length("clean").cast("long").alias("n_chars_clean"),
    )


@register(
    "docs_chunk_dedup_rewrite",
    tags=("dedup", "text", "lines", "rewrite"),
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, k,
               md5(array_to_string(toks[16*k+1 : 16*(k+1)], ' ')) AS h,
               array_to_string(toks[16*k+1 : 16*(k+1)], ' ') AS chunk
        FROM t, LATERAL (
            SELECT unnest(generate_series(
                0, CAST(CEIL(LEN(toks) / 16.0) AS INT) - 1)) AS k)
    ),
    kept AS (
        SELECT doc_id, lang, k, chunk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY h ORDER BY doc_id, k) AS rn
            FROM c
        ) WHERE rn = 1
    ),
    rebuilt AS (
        SELECT doc_id, COUNT(*) AS kept_chunks,
               string_agg(chunk, ' ' ORDER BY k) AS body
        FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, lang, COUNT(*) AS n_chunks FROM c GROUP BY doc_id, lang)
    SELECT t.doc_id, t.lang, t.n_chunks,
           CAST(COALESCE(r.kept_chunks, 0) AS BIGINT) AS kept_chunks,
           md5(COALESCE(r.body, '')) AS rebuilt_md5
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def docs_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup as a REWRITE (the C4/RefinedWeb repeated-line
    removal, recast onto the fixture's line-less text as aligned 16-token
    chunks — the 'sentence' unit): every chunk occurring anywhere else in
    the corpus keeps only its FIRST (doc_id, position) occurrence, later
    copies are excised and each doc re-emitted from its surviving chunks
    in order. Distinct machinery from the sliding-window span rewrite:
    non-overlapping aligned units, one md5 chunk key (engine-portable, so
    the oracle replays the dedup verbatim), one hash shuffle on the key +
    one per-doc regroup. The rebuilt-body md5 pins the OUTPUT BYTES, not
    just counts. 100 TB: chunks ∝ tokens/16, both shuffles hash-bounded;
    boilerplate-heavy corpora shrink the regroup side further."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    from ..functions.text import tokens

    t = docs.select("doc_id", "lang", tokens("text").alias("toks"))
    c = (
        t.select(
            "doc_id",
            "lang",
            F.size("toks").alias("n"),
            F.explode(
                F.sequence(F.lit(0), F.ceil(F.size("toks") / 16.0).cast("int") - 1)
            ).alias("k"),
            F.col("toks"),
        )
        .select(
            "doc_id",
            "lang",
            "k",
            F.array_join(
                F.slice(F.col("toks"), F.col("k") * 16 + 1, 16), " "
            ).alias("chunk"),
        )
        .withColumn("h", F.md5("chunk"))
    )
    w = Window.partitionBy("h").orderBy("doc_id", "k")
    kept = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "h")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_chunks"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("body"),
    )
    totals = c.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "lang",
        "n_chunks",
        F.coalesce("kept_chunks", F.lit(0)).cast("long").alias("kept_chunks"),
        F.md5(F.coalesce("body", F.lit(""))).alias("rebuilt_md5"),
    )
