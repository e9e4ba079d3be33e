"""Edit-distance similarity join (operators/fuzzyjoin.py): the segment
blocking must be SOUND — bit-equal to brute-force levenshtein over all
pairs — for substitutions, insertions, and deletions, at d=1 and d=2,
plus the short-key broadcast path and the loud hot-segment cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.fuzzyjoin import (
    fuzzy_key_join,
    fuzzy_neardup_pairs,
)


def _hexkeys(spark, n=300, width=12):
    return spark.range(n).select(
        F.col("id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, width).alias("key"),
    )


def _brute(df, d):
    a = df.select(F.col("id").alias("id_a"), F.col("key").alias("key_a"))
    b = df.select(F.col("id").alias("id_b"), F.col("key").alias("key_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= d)
    )


def _norm(rows):
    return sorted((r["id_a"], r["id_b"], r["dist"]) for r in rows)


def test_blocking_is_sound_d1_substitution(spark):
    docs = _hexkeys(spark)
    mut = docs.filter(F.col("id") % 13 == 0).select(
        (F.col("id") + 10_000).alias("id"),
        F.concat(F.substring("key", 1, 5), F.lit("z"),
                 F.substring("key", 7, 6)).alias("key"),
    )
    corpus = docs.unionByName(mut)
    got = _norm(fuzzy_neardup_pairs(corpus, max_dist=1).collect())
    want = _norm(_brute(corpus, 1).collect())
    assert got == want and got, "mutants must be found, exactly"


def test_blocking_is_sound_d2_indels(spark):
    """d=2 with every edit kind: double substitution, single deletion
    (length 11), single insertion (length 13)."""
    docs = _hexkeys(spark, n=200)
    sub2 = docs.filter(F.col("id") % 29 == 0).select(
        (F.col("id") + 20_000).alias("id"),
        F.concat(F.substring("key", 1, 2), F.lit("Z"), F.substring("key", 4, 5),
                 F.lit("Z"), F.substring("key", 10, 3)).alias("key"),
    )
    dele = docs.filter(F.col("id") % 31 == 0).select(
        (F.col("id") + 30_000).alias("id"),
        F.concat(F.substring("key", 1, 4), F.substring("key", 6, 7)).alias("key"),
    )
    ins = docs.filter(F.col("id") % 37 == 0).select(
        (F.col("id") + 40_000).alias("id"),
        F.concat(F.substring("key", 1, 8), F.lit("Q"),
                 F.substring("key", 9, 4)).alias("key"),
    )
    corpus = docs.unionByName(sub2).unionByName(dele).unionByName(ins)
    got = _norm(fuzzy_neardup_pairs(corpus, max_dist=2).collect())
    want = _norm(_brute(corpus, 2).collect())
    assert got == want
    assert any(d == 2 for _, _, d in got) and any(d == 1 for _, _, d in got)


def test_short_keys_route_through_broadcast_block(spark):
    """Keys shorter than d+1 chars can't be segmented (a zero-length
    segment would match everything) — the explicit short-key block must
    still find their true pairs."""
    rows = [(1, "a"), (2, "b"), (3, "ab"), (4, "xy"), (5, "abcdefgh")]
    df = spark.createDataFrame(rows, "id long, key string")
    got = _norm(fuzzy_neardup_pairs(df, max_dist=1).collect())
    want = _norm(_brute(df, 1).collect())
    assert got == want
    assert (1, 2, 1) in got and (1, 3, 1) in got  # short-short + short-long


def test_null_keys_never_match_and_two_table_form(spark):
    left = spark.createDataFrame(
        [(1, "abcdef"), (2, None)], "id long, key string"
    )
    right = spark.createDataFrame(
        [(10, "abcdeX"), (11, None), (12, "zzzzzz")], "id long, key string"
    )
    rows = fuzzy_key_join(left, right, max_dist=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 10)}


def test_two_table_overlapping_id_spaces(spark):
    """ADVICE r8 #1 regression: left and right come from independent
    sources, so an unrelated pair sharing an id VALUE must survive —
    the id_a != id_b filter belongs to the self-join wrapper only."""
    left = spark.createDataFrame([(7, "abcdef")], "id long, key string")
    right = spark.createDataFrame(
        [(7, "abcdeX"), (8, "abcdef")], "id long, key string"
    )
    rows = fuzzy_key_join(left, right, max_dist=1).collect()
    assert {(r["id_a"], r["id_b"], r["dist"]) for r in rows} == {
        (7, 7, 1),  # same id value, different sources — must NOT drop
        (7, 8, 0),
    }


def test_duplicate_ids_within_a_side_keep_true_pairs(spark):
    """ADVICE r8 #1 regression: dedup keys on (id, key) pairs, not ids —
    a right side with two rows under one id (different keys) must not
    let the non-matching key shadow the matching one."""
    left = spark.createDataFrame([(1, "abcdef")], "id long, key string")
    right = spark.createDataFrame(
        [(5, "zzzzzz"), (5, "abcdeX")], "id long, key string"
    )
    rows = fuzzy_key_join(left, right, max_dist=1).collect()
    assert [(r["id_a"], r["id_b"], r["key_b"], r["dist"]) for r in rows] == [
        (1, 5, "abcdeX", 1)
    ]


def test_hot_segment_cap_is_loud(spark):
    """Boilerplate keys (shared prefix) blow up one segment's bucket —
    the cap must drop candidates LOUDLY via cap_observations."""
    from hedera_etl_spark.operators.stats import cap_counts

    df = spark.range(200).select(
        F.col("id"),
        # identical first half, distinct second half -> segment 1 is hot
        F.concat(F.lit("booooring"),
                 F.substring(F.md5(F.col("id").cast("string")), 1, 9)).alias("key"),
    )
    caps: dict = {}
    out = fuzzy_neardup_pairs(
        df, max_dist=1, max_segment=50, cap_observations=caps
    )
    out.count()
    got = cap_counts(caps)["fuzzy_segment_cap"]
    assert got["capped_members"] > 0
    assert got["max_bucket_size"] > 50


def test_cap_asymmetric_direction_is_canonicalized_not_dropped(spark):
    """r9 review finding: under an active hot-segment cap the two probe
    directions of one pair can survive asymmetrically (an indel shifts
    segment alignment, so one direction matches only through the capped
    boilerplate value).  The self-join wrapper must SWAP the surviving
    reverse-direction row into canonical order — a plain id_a < id_b
    filter would lose the pair whenever the surviving probe side
    carries the larger id (verified: on this corpus the raw join finds
    ONLY the (big, small) direction)."""
    import hashlib

    B = "BOILERPLATEXX"
    x = "qwertyuiopasd"
    rows = [(9_000_000, B + x), (1, B + "Z" + x)]  # 1-insertion pair
    rows += [
        (i, B + hashlib.md5(str(i).encode()).hexdigest()[:13])
        for i in range(2, 120)  # make B-substring buckets hot
    ]
    df = spark.createDataFrame(rows, "id long, key string")
    raw = fuzzy_key_join(df, df, max_dist=1, max_segment=60)
    dirs = {
        (r["id_a"], r["id_b"])
        for r in raw.collect()
        if {r["id_a"], r["id_b"]} == {1, 9_000_000}
    }
    assert dirs == {(9_000_000, 1)}, "corpus must exhibit the asymmetry"
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_neardup_pairs(df, max_dist=1, max_segment=60).collect()
    }
    assert (1, 9_000_000) in got


def test_exact_duplicates_found_at_d0(spark):
    rows = [(1, "same"), (2, "same"), (3, "diff")]
    df = spark.createDataFrame(rows, "id long, key string")
    got = _norm(fuzzy_neardup_pairs(df, max_dist=0).collect())
    assert got == [(1, 2, 0)]
