"""Document deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH, SimHash and n-gram-Jaccard near-dup detection —
all expressed with JVM-side built-ins only (md5 / transform / explode /
groupBy / joins), no Python UDFs, so every stage stays in whole-stage codegen
and scales by partitioning alone.

Cross-engine determinism: hashes derive from md5 hex digests (see
hedera_etl_spark.functions) so the DuckDB oracle reproduces every value
bit-for-bit.  MinHash exploits that the lexicographic MIN of fixed-length
hex strings equals the numeric MIN of the underlying 128-bit values.

Scale design (100 TB corpus, 1000 executors):
- (doc, shingle) is the widest intermediate; it is produced by explode and
  immediately hash-partitioned by the groupBy/join key — no global sorts.
- MinHash signatures are ONE hash-aggregate pass producing k columns (not k
  passes), then bands explode to (band, sig) buckets; the candidate self-join
  is an equi-join on (band, sig), broadcast-free, and skew-capped (see
  ``lsh_candidates(max_bucket=...)``: degenerate buckets are dropped exactly
  like stop-shingles, a standard LSH production guard).
- SimHash blocking uses the pigeonhole principle: fingerprints within
  hamming distance d share at least one of d+1 bands, so candidate
  generation is an equi-join on (band_id, band_value) — never all-pairs.
- n-gram Jaccard blocks on rare shingles (document-frequency cap), the
  prefix-filtering idea: a pair is a candidate only if it co-occurs in a
  shingle rare enough to be discriminative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hedera_etl_spark.functions import shingles, tokens

HEX_HIGH = list("89abcdef")  # hex digits whose high nibble-bit is set


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: hash-aggregate on content, keep min id.

    Returns (keep_id, n_copies) per distinct content.  At scale, group on
    md5(text) instead of raw text to shrink shuffle width — semantics are
    identical modulo md5 collisions (2^-64 at corpus scale).
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------
def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_id, shingle) pairs; shingles are n-token windows."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), shingles(tokens(text_col), n).alias("sh"))
        .select("doc_id", F.explode("sh").alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(sh: DataFrame, k: int = 9) -> DataFrame:
    """k-member MinHash signature in a single aggregate pass.

    Hash family i is md5('i:' || shingle); the min is taken on the hex
    string (= numeric min for fixed-length hex).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidates(
    sig: DataFrame, bands: int = 3, rows: int = 3, max_bucket: int | None = None
) -> DataFrame:
    """Candidate pairs: docs sharing at least one LSH band signature.

    Bands explode to (doc_id, band, sig); the self-join is an equi-join on
    (band, sig).  ``max_bucket`` drops degenerate buckets (skew guard for
    production corpora where boilerplate shingles collapse many docs into
    one bucket).
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[f"mh_{b * rows + j}" for j in range(rows)]).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    if max_bucket is not None:
        sizes = buckets.groupBy("band", "sig").agg(F.count("*").alias("bn"))
        buckets = buckets.join(
            sizes.filter(F.col("bn") <= max_bucket).select("band", "sig"), ["band", "sig"]
        )
    left = buckets.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    right = buckets.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def verify_jaccard(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Intersection counts come from a pair-scoped equi-join on shingle; set
    sizes from one aggregate.  Returns (doc_a, doc_b, inter, n_a, n_b,
    jaccard) with jaccard as DECIMAL(9,6) — the division is a single IEEE op
    over exact integers, so the value is engine-independent.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    n_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    n_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(n_a, "doc_a")
        .join(n_b, "doc_b")
        .withColumn(
            "jaccard",
            (
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).cast("decimal(9,6)"),
        )
        .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")
    )


def minhash_lsh_neardups(
    docs: DataFrame,
    n: int = 3,
    k: int = 9,
    bands: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash/LSH near-dup pipeline: shingle -> sign -> band ->
    candidate join -> exact-Jaccard verify -> threshold."""
    rows = k // bands
    sh = doc_shingles(docs, n)
    sig = minhash_signatures(sh, k)
    cand = lsh_candidates(sig, bands, rows)
    return (
        verify_jaccard(sh, cand)
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def _bit_sign(h: Column, j: int) -> Column:
    """+1/-1 from the j-th hex char's high bit of an md5 digest."""
    return F.when(F.substring(h, j + 1, 1).isin(HEX_HIGH), F.lit(1)).otherwise(F.lit(-1))


def simhash_fingerprints(
    docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc SimHash: token-count-weighted sign sum per bit, then sign.

    Bit j of the fingerprint is set iff sum over tokens of
    count(token) * (+/-1 from md5(token) hex char j) is positive.  One
    explode + two hash aggregates; all 32 bit-sums are columns of a single
    aggregate pass.
    """
    tok = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.md5("token"))
    )
    sums = tok.groupBy("doc_id").agg(
        *[F.sum(F.col("cnt") * _bit_sign(F.col("h"), j)).alias(f"s_{j}") for j in range(bits)]
    )
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_neardups(
    docs: DataFrame, bits: int = 32, n_bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance with banded blocking.

    Pigeonhole: two fingerprints within hamming distance ``max_hamming``
    agree on at least one of ``max_hamming + 1`` disjoint bands — with
    n_bands > max_hamming the equi-join on (band_id, band_value) is a
    complete (no-miss) blocking scheme.
    """
    assert n_bands > max_hamming, "blocking is lossy unless n_bands > max_hamming"
    band_bits = bits // n_bands
    fp = simhash_fingerprints(docs, bits)
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = fp.select("doc_id", "simhash", F.explode(bands_arr).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv")
    )
    left = buckets.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"), "band", "bv")
    right = buckets.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"), "band", "bv")
    pairs = (
        left.join(right, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with rare-shingle blocking
# ---------------------------------------------------------------------------
def ngram_jaccard_neardups(
    docs: DataFrame, n: int = 3, max_df: int = 20, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-dups, blocked on rare shingles.

    Candidate pairs must co-occur in a shingle with document frequency
    <= max_df (prefix-filtering): discriminative shingles generate few
    pairs, boilerplate shingles generate none.  The Jaccard itself is then
    computed over the FULL shingle sets of each candidate pair.
    """
    sh = doc_shingles(docs, n)
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    rare = sh.join(
        df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
    )
    left = rare.select(F.col("doc_id").alias("doc_a"), "shingle")
    right = rare.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (
        left.join(right, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        verify_jaccard(sh, cand)
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
