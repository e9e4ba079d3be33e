"""Text dedup + text analysis registry entries (LLM training-data surface).

Every operator family from operators/textdedup.py and textanalysis.py gets a
``queries()`` entry with a full DuckDB oracle — possible because the
operators hash with md5 and divide exact integers, both engine-portable
(see functions/__init__.py and queries/_oracle.py).

Corpus construction for dedup entries mirrors the reference's
integration-test generator (every-k-th row duplicated,
TransactionsGenerator.java:70-81): exact clones for exact/simhash dedup,
one-token-appended mutants for the jaccard-threshold near-dup entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_etl_spark.operators.textanalysis import (
    LANG_PROFILES,
    SCRUB_PATTERNS,
    WORD_PATTERN,
    char_fingerprints,
    chunk_documents,
    groupwise_minmax_norm,
    language_scores,
    quality_scores,
    scrub_text,
    token_stats,
)
from hedera_etl_spark.operators.textdedup import (
    exact_duplicates,
    minhash_lsh_neardups,
    ngram_jaccard_neardups,
    simhash_fingerprints,
    simhash_neardups,
)
from hedera_etl_spark.queries import query
from hedera_etl_spark.queries._oracle import (
    argmax_case,
    jaccard_select,
    lsh_bucket_cte,
    minhash_sig_cte,
    shingle_cte,
    simhash_fp_cte,
)
from hedera_etl_spark.tables import load_table

# Exact-clone corpus: every 7th doc re-ingested under a new id.
_DUP_DOCS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""

# Near-dup corpus: every 13th doc with one appended token (high-but-not-1.0
# jaccard against its original).
_NEARDUP_DOCS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text || ' zzz' AS text
      FROM documents WHERE doc_id % 13 = 0
"""


def dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(clones)


def neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutants = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return docs.unionByName(mutants)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
@query(
    "llm_exact_dedup",
    f"""
    WITH corpus AS ({_DUP_DOCS_SQL})
    SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM corpus GROUP BY md5(text)
    ORDER BY keep_id
    """,
    tags=("llm", "dedup"),
    bench=True,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate collapse by content hash: one hash-aggregate on
    md5(text), the map-side-combining scale path for byte-identical dedup
    (operators/textdedup.py exact_duplicates)."""
    return exact_duplicates(dup_docs(spark, sf_dir)).orderBy("keep_id")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------
_MINHASH_ORACLE = f"""
    WITH corpus AS ({_NEARDUP_DOCS_SQL}),
    {shingle_cte('corpus')},
    {minhash_sig_cte(k=9)},
    {lsh_bucket_cte(bands=3, rows=3, max_bucket=500)},
    {jaccard_select(0.5)}
"""


@query(
    "llm_minhash_neardup",
    _MINHASH_ORACLE,
    tags=("llm", "dedup", "minhash"),
    bench=True,
)
def llm_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline: shingle -> 9-member signature in one
    aggregate pass -> 3 banded buckets -> skew-capped candidate equi-join ->
    exact-Jaccard verify (never all-pairs; operators/textdedup.py)."""
    return minhash_lsh_neardups(
        neardup_docs(spark, sf_dir), n=3, k=9, bands=3, threshold=0.5, max_bucket=500
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with rare-shingle blocking
# ---------------------------------------------------------------------------
_NGRAM_ORACLE = f"""
    WITH corpus AS ({_NEARDUP_DOCS_SQL}),
    {shingle_cte('corpus')},
    dfc AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 20),
    rare AS (SELECT sh.* FROM sh JOIN dfc USING (shingle)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b USING (shingle)
      WHERE a.doc_id < b.doc_id
    ),
    {jaccard_select(0.8)}
"""


@query(
    "llm_ngram_jaccard",
    _NGRAM_ORACLE,
    tags=("llm", "dedup", "jaccard"),
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dups blocked on rare shingles
    (document-frequency-capped prefix filtering — boilerplate shingles
    generate zero candidate pairs)."""
    return ngram_jaccard_neardups(neardup_docs(spark, sf_dir), n=3, max_df=20, threshold=0.8)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
@query(
    "llm_simhash_fp",
    f"""
    WITH {simhash_fp_cte('documents')}
    SELECT doc_id, fp_hi, fp_lo FROM fp ORDER BY doc_id
    """,
    tags=("llm", "dedup", "simhash"),
    bench=True,
)
def llm_simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints as two 32-bit halves: one explode + one
    (doc, token) count aggregate + one 64-column sign-sum aggregate — the
    whole fingerprint is two scans regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_fingerprints(docs).orderBy("doc_id")


_SIMHASH_PAIR_ORACLE = f"""
    WITH corpus AS ({_DUP_DOCS_SQL}),
    {simhash_fp_cte('corpus')},
    buckets AS (
      SELECT doc_id, fp_hi, fp_lo, 0 AS band, (fp_lo >> 0)  & 65535 AS bv FROM fp
      UNION ALL
      SELECT doc_id, fp_hi, fp_lo, 1 AS band, (fp_lo >> 16) & 65535 AS bv FROM fp
      UNION ALL
      SELECT doc_id, fp_hi, fp_lo, 2 AS band, (fp_hi >> 0)  & 65535 AS bv FROM fp
      UNION ALL
      SELECT doc_id, fp_hi, fp_lo, 3 AS band, (fp_hi >> 16) & 65535 AS bv FROM fp
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.fp_hi AS hi_a, a.fp_lo AS lo_a,
                      b.fp_hi AS hi_b, b.fp_lo AS lo_b
      FROM buckets a JOIN buckets b USING (band, bv)
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
    FROM pairs
    WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 3
    ORDER BY doc_a, doc_b
"""


@query(
    "llm_simhash_neardup",
    _SIMHASH_PAIR_ORACLE,
    tags=("llm", "dedup", "simhash"),
)
def llm_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with 16-bit banded blocking (pigeonhole: a
    hamming<=3 pair agrees on one of 4 disjoint bands), hamming distance via
    bit_count(xor) on each half."""
    pairs = simhash_neardups(dup_docs(spark, sf_dir), n_bands=4, max_hamming=3)
    return pairs.withColumn("hamming", F.col("hamming").cast("long"))


# ---------------------------------------------------------------------------
# token stats / language id / quality / fingerprints
# ---------------------------------------------------------------------------
@query(
    "llm_text_stats",
    f"""
    WITH ts AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '{WORD_PATTERN}')) AS BIGINT) AS n_re_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    qbase AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS stop_hits
      FROM documents
    )
    SELECT ts.doc_id, ts.n_ws_tokens, ts.n_re_tokens, ts.n_distinct_tokens, ts.n_chars,
           CAST(CAST(q.n_distinct / q.n_tokens AS DECIMAL(9,6)) AS DOUBLE) AS ttr,
           CAST(CAST((ts.n_chars - (q.n_tokens - 1)) / q.n_tokens AS DECIMAL(9,6)) AS DOUBLE)
             AS avg_token_len,
           CAST(CAST(q.stop_hits / q.n_tokens AS DECIMAL(9,6)) AS DOUBLE) AS stopword_ratio,
           CAST(CAST((q.n_distinct * 100 + q.stop_hits * 10) / q.n_tokens AS DECIMAL(12,6))
                AS DOUBLE) AS quality_score
    FROM ts JOIN qbase q USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("llm", "textstats", "quality"),
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokens, BPE-ish regex tokens, distinct
    tokens, char length) joined with the heuristic quality features
    (type-token ratio, mean token length, stopword ratio, combined score)
    into one per-doc stats entry — two narrow projections joined on the
    doc key, no wide shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    quality = quality_scores(docs).select(
        "doc_id", "ttr", "avg_token_len", "stopword_ratio", "quality_score"
    )
    return token_stats(docs).join(quality, "doc_id").orderBy("doc_id")


_LANGS = sorted(LANG_PROFILES)


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), x -> x IN ({words}))) AS BIGINT)"
        f" AS hits_{lang}"
    )


_LANG_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {", ".join(_hits_sql(lang) for lang in _LANGS)}
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             {", ".join(f"CAST(CAST(hits_{lang} / n_tokens AS DECIMAL(9,6)) AS DOUBLE) AS score_{lang}" for lang in _LANGS)}
      FROM base
    )
    SELECT doc_id, {", ".join(f"score_{lang}" for lang in _LANGS)},
           {argmax_case(_LANGS)} AS predicted_lang
    FROM scored ORDER BY doc_id
"""


@query(
    "llm_language_id",
    _LANG_ORACLE,
    tags=("llm", "langid"),
)
def llm_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via per-language stopword-ratio scores + deterministic
    earliest-index argmax (CASE chain runs identically in the oracle)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return language_scores(docs).orderBy("doc_id")


@query(
    "llm_groupwise_norm",
    """
    SELECT doc_id, lang, n_chars AS value,
           CASE WHEN MAX(n_chars) OVER w = MIN(n_chars) OVER w THEN 0
                ELSE ((n_chars - MIN(n_chars) OVER w) * 1000000)
                     // (MAX(n_chars) OVER w - MIN(n_chars) OVER w)
           END AS norm_ppm
    FROM documents
    WINDOW w AS (PARTITION BY lang)
    ORDER BY doc_id
    """,
    tags=("llm", "pandas-udf", "grouped-map"),
)
def llm_groupwise_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language min-max normalization in
    parts-per-million (pure integer arithmetic — engine-exact).  The SQL
    twin is the window form; the Pandas form is the shape for per-group
    logic that genuinely needs imperative code."""
    docs = load_table(spark, sf_dir, "documents")
    return groupwise_minmax_norm(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# chunking + PII scrub (promoted to oracle-checked entries in r5; previously
# pytest-only)
# ---------------------------------------------------------------------------
_CHUNK, _OVERLAP = 128, 16
_STEP = _CHUNK - _OVERLAP

_CHUNK_ORACLE = """
    WITH toked AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    n AS (
      SELECT doc_id, toks,
             CAST(greatest(ceil(greatest(len(toks) - {overlap}, 1) / {step}.0), 1)
                  AS BIGINT) AS n_chunks
      FROM toked
    ),
    e AS (
      SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM n
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           array_to_string(
             list_slice(toks, chunk_idx*{step} + 1, chunk_idx*{step} + {chunk}), ' ')
             AS chunk_text,
           CAST(len(list_slice(toks, chunk_idx*{step} + 1, chunk_idx*{step} + {chunk}))
                AS BIGINT) AS n_tokens
    FROM e
    ORDER BY doc_id, chunk_idx
""".format(chunk=_CHUNK, overlap=_OVERLAP, step=_STEP)


@query(
    "llm_chunking",
    _CHUNK_ORACLE,
    tags=("llm", "chunking"),
)
def llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (128-token chunks, 16 overlap):
    tokenize once, slice windows, explode — zero-shuffle map-side fan-out
    (operators/textanalysis.py chunk_documents)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=_CHUNK, overlap=_OVERLAP).orderBy(
        "doc_id", "chunk_idx"
    )


def _scrub_oracle() -> str:
    email, phone, num = (p for _, p, _ in SCRUB_PATTERNS)
    return f"""
    WITH s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_email,
             regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    s2 AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t1, '{phone}')) AS BIGINT) AS n_phone,
             regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS t2
      FROM s1
    ),
    s3 AS (
      SELECT doc_id, n_email, n_phone,
             CAST(len(regexp_extract_all(t2, '{num}')) AS BIGINT) AS n_long_number,
             regexp_replace(t2, '{num}', '<NUM>', 'g') AS scrubbed_text
      FROM s2
    )
    SELECT doc_id, scrubbed_text, n_email, n_phone, n_long_number
    FROM s3 ORDER BY doc_id
    """


@query(
    "llm_pii_scrub",
    _scrub_oracle(),
    tags=("llm", "pii", "scrub"),
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-shaped span redaction (email/phone/long-number) via chained
    regexp_replace with per-class hit counts computed against the
    progressively scrubbed text — one JVM projection, no shuffle
    (operators/textanalysis.py scrub_text).  The oracle chains the same
    three classes in the same order, proving the count-after-replace
    semantics cross-engine."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return scrub_text(docs).orderBy("doc_id")


@query(
    "llm_char_fingerprint",
    """
    WITH g AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(length(text) - 4, 1)),
                            i -> substring(text, i, 5)) AS grams
      FROM documents
    )
    SELECT doc_id,
           substring(list_min(list_transform(grams, x -> md5(x))), 1, 16) AS fingerprint,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_grams
    FROM g ORDER BY doc_id
    """,
    tags=("llm", "fingerprint"),
)
def llm_char_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min-md5 over character 5-grams
    (rolling windows as a pure index-sequence transform, no UDF)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return char_fingerprints(docs, gram=5).orderBy("doc_id")
