"""DuckDB oracle SQL fragments for the LLM-pipeline query modules.

Every operator in operators/textdedup.py, textanalysis.py and similarity.py
is built from md5-derived hashing and sequential floating-point folds
precisely so a DuckDB oracle can reproduce each value bit-for-bit.  The
fragments here are the DuckDB twins of those Spark expressions; each twin
cites the Spark function it mirrors so drift is auditable.

These are *SQL text generators* (plain Python string building at import
time) — nothing here executes anything.
"""

from __future__ import annotations

HEX_HIGH_SQL = "('8','9','a','b','c','d','e','f')"
#: hex chars whose SECOND bit (value 4) is set
HEX_BIT2_SQL = "('4','5','6','7','c','d','e','f')"


def shingle_cte(src: str, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> str:
    """Distinct (doc_id, shingle) pairs — twin of textdedup.doc_shingles.

    Spark: F.transform over an index sequence joining n tokens with spaces;
    DuckDB: list_transform over generate_series with a 1-based inclusive
    list slice.  Docs shorter than n tokens yield no rows on both sides.
    """
    return f"""
    toks AS (SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS t FROM {src}),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t) - {n - 1}, 0)),
                                   i -> array_to_string(t[i:i+{n - 1}], ' '))) AS shingle
      FROM toks
    )"""


def minhash_sig_cte(k: int = 9) -> str:
    """MinHash signature columns — twin of textdedup.minhash_signatures.

    Kirsch-Mitzenmacher family: one md5 per shingle parsed into two
    32-bit halves (h1, h2); member i is (h1 + i*h2) mod 2^32.  Pure
    BIGINT arithmetic, identical in both engines.
    """
    cols = ",\n             ".join(
        f"min((h1 + {i} * h2) % 4294967296) AS mh_{i}" for i in range(k)
    )
    return f"""
    shh AS (
      SELECT doc_id,
             ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {cols}
      FROM shh GROUP BY doc_id
    )"""


def lsh_bucket_cte(bands: int = 3, rows: int = 3, max_bucket: int | None = 500) -> str:
    """Banded buckets + skew guard + candidate pairs — twin of
    textdedup.lsh_candidates (band signatures via concat_ws, degenerate
    buckets dropped, equi-self-join, doc_a < doc_b, distinct)."""
    band_selects = "\n      UNION ALL\n".join(
        "      SELECT doc_id, {b} AS band, concat_ws('|', {cols}) AS sig FROM sig".format(
            b=b, cols=", ".join(f"mh_{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    guard = ""
    src = "buckets"
    if max_bucket is not None:
        guard = f""",
    kept AS (
      SELECT band, sig FROM buckets GROUP BY band, sig HAVING COUNT(*) <= {max_bucket}
    ),
    buckets_g AS (SELECT b.* FROM buckets b JOIN kept USING (band, sig))"""
        src = "buckets_g"
    return f"""
    buckets AS (
{band_selects}
    ){guard},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM {src} a JOIN {src} b USING (band, sig)
      WHERE a.doc_id < b.doc_id
    )"""


def jaccard_select(threshold: float) -> str:
    """Exact shingle-Jaccard verify over cand — twin of
    textdedup.verify_jaccard (+ threshold filter + total order)."""
    return f"""
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.inter,
           na.n AS n_a, nb.n AS n_b,
           CAST(CAST(i.inter / (na.n + nb.n - i.inter) AS DECIMAL(9,6)) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE CAST(i.inter / (na.n + nb.n - i.inter) AS DECIMAL(9,6)) >= {threshold}
    ORDER BY doc_a, doc_b"""


def ngram_pairs_cte(threshold: float = 0.8, max_df: int = 20) -> str:
    """Prefix-filtered exact-Jaccard near-dup PAIRS as a ``pairs`` CTE —
    the CTE-composable form of the blocking + verify chain that
    ``textops._NGRAM_ORACLE`` inlines (twin of
    textdedup.ngram_jaccard_neardups): blocking keys are each doc's
    first ``sz - floor(t*sz) + 1`` surviving shingles in rarest-first
    global order, 2 <= df <= max_df applies before ranking, then the
    exact shingle-Jaccard verify at DECIMAL(9,6).  Assumes a ``sh``
    (doc_id, shingle) CTE is in scope."""
    return f"""
    szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    dfc AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
            HAVING COUNT(*) BETWEEN 2 AND {max_df}),
    ranked AS (
      SELECT sh.doc_id, sh.shingle, s.sz,
             ROW_NUMBER() OVER (PARTITION BY sh.doc_id
                                ORDER BY d.df, sh.shingle) AS rn
      FROM sh JOIN dfc d USING (shingle) JOIN szs s USING (doc_id)
    ),
    pre AS (SELECT doc_id, shingle, sz FROM ranked
            WHERE rn <= sz - floor({threshold} * sz) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pre a JOIN pre b USING (shingle)
      WHERE a.doc_id < b.doc_id
        AND CAST(LEAST(a.sz, b.sz) AS DOUBLE)
            >= {threshold} * CAST(GREATEST(a.sz, b.sz) AS DOUBLE)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes na ON na.doc_id = i.doc_a
      JOIN sizes nb ON nb.doc_id = i.doc_b
      WHERE CAST(i.inter / (na.n + nb.n - i.inter) AS DECIMAL(9,6)) >= {threshold}
    )"""


def simhash_fp_cte(src: str) -> str:
    """64-bit SimHash as (fp_hi, fp_lo) 32-bit halves — twin of
    textdedup.simhash_fingerprints: ONE md5 per token; low-half bit j
    votes with hex char j+1's HIGH bit (char in 8..f), high-half bit j
    with the same char's SECOND bit (char in 4..7, c..f); bit set iff
    the count-weighted vote sum is positive."""
    sum_cols = []
    for half, charset in (("lo", HEX_HIGH_SQL), ("hi", HEX_BIT2_SQL)):
        for j in range(32):
            sum_cols.append(
                f"sum(CASE WHEN substring(d, {j + 1}, 1) IN {charset}"
                f" THEN cnt ELSE -cnt END) AS s_{half}_{j}"
            )
    sums = ",\n             ".join(sum_cols)

    def half_expr(prefix: str) -> str:
        return " + ".join(
            f"(CASE WHEN s_{prefix}_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
        )

    return f"""
    tok AS (
      SELECT doc_id, token, COUNT(*) AS cnt, md5(token) AS d
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM {src})
      GROUP BY doc_id, token
    ),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM tok GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id,
             CAST({half_expr('hi')} AS BIGINT) AS fp_hi,
             CAST({half_expr('lo')} AS BIGINT) AS fp_lo
      FROM sums
    )"""


def fold_dot(a: str, b: str, dims: int) -> str:
    """Sequential-fold dot product — twin of functions.dot (zip_with then
    F.aggregate left fold; 0.0 + x == x in IEEE, so list_reduce over the
    products matches Spark's zero-seeded fold bit-for-bit)."""
    return (
        f"list_reduce(list_transform(generate_series(1, {dims}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )


def fold_norm(a: str, dims: int) -> str:
    """Sequential-fold L2 norm — twin of functions.norm."""
    return (
        f"sqrt(list_reduce(list_transform(generate_series(1, {dims}), "
        f"i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (acc, x) -> acc + x))"
    )


def fold_cosine(a: str, b: str, dims: int) -> str:
    """Cosine via sequential folds — twin of functions.cosine."""
    return f"({fold_dot(a, b, dims)} / ({fold_norm(a, dims)} * {fold_norm(b, dims)}))"


def plane_literal(plane: list[int]) -> str:
    """A hyperplane row as a DOUBLE[] literal (matches the F.array of
    F.lit(float) the Spark side embeds)."""
    return "([" + ", ".join(f"{float(s)}" for s in plane) + "]::DOUBLE[])"


def lsh_bucket_expr(vec: str, signs: list[list[int]], dims: int) -> str:
    """LSH bucket id from literal hyperplanes — twin of
    similarity.lsh_bucket_col (bit p set iff dot(vec, plane_p) >= 0)."""
    bits = []
    for p, plane in enumerate(signs):
        dot = fold_dot(vec, plane_literal(plane), dims)
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def argmax_case(langs: list[str], prefix: str = "score_") -> str:
    """Earliest-index argmax as a CASE chain — twin of
    textanalysis.language_scores' prediction column."""
    arms = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{prefix}{lang} >= {prefix}{other}" for other in langs[i + 1 :])
        arms.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(arms) + f" ELSE '{langs[-1]}' END"
