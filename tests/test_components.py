"""Connected components: known topologies in, exact clusterings out.

Ground truth is an in-test union-find — the point of each case is a graph
SHAPE that breaks a naive implementation: long chains (O(diameter) for
plain label propagation), merged stars, cliques (the common dup-cluster
shape), and pair-less singletons.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _truth(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Min-id component labels via union-find."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def _run(spark, edges: list[tuple[int, int]]):
    from hedera_etl_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


@pytest.mark.parametrize(
    "name,edges,n",
    [
        # a 24-node chain: diameter 23 — plain min-label propagation
        # needs ~23 rounds, large/small-star a handful
        ("chain", [(i, i + 1) for i in range(23)], 24),
        # two cliques bridged by one edge, plus an untouched clique
        (
            "cliques",
            [(a, b) for a in range(5) for b in range(a + 1, 5)]
            + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
            + [(4, 10)]
            + [(a, b) for a in range(20, 23) for b in range(a + 1, 23)],
            23,
        ),
        # two stars merged at their centers, reversed edge orientations
        ("stars", [(5, i) for i in range(5)] + [(15, i) for i in range(10, 15)] + [(15, 5)], 16),
        # duplicate and self-descriptive edges must be harmless
        ("dups", [(1, 2), (2, 1), (1, 2), (2, 3), (3, 3)], 4),
    ],
)
def test_components_match_union_find(spark, name, edges, n):
    got = _run(spark, edges)
    want = _truth(n, edges)
    touched = {x for e in edges for x in e if e[0] != e[1]}
    assert got == {x: want[x] for x in touched}, name


def test_empty_edges_give_empty_output(spark):
    from hedera_etl_spark.operators.components import connected_components

    df = spark.createDataFrame([], "src LONG, dst LONG")
    assert connected_components(df).count() == 0


def test_collapse_keeps_min_per_cluster_and_singletons(spark):
    from hedera_etl_spark.operators.components import collapse_components

    ids = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "doc_a LONG, doc_b LONG"
    )
    rows = {r["doc_id"]: (r["component"], r["keep"]) for r in collapse_components(ids, pairs).collect()}
    assert rows == {
        0: (0, True),
        1: (1, True), 4: (1, False), 6: (1, False),
        2: (2, True), 3: (2, False),
        5: (5, True), 7: (7, True),
    }


def test_collapse_composes_with_minhash_pairs(spark):
    """End-to-end: near-dup pairs from the MinHash detector collapse into
    keeper decisions — the actual pipeline a training-data dedup runs."""
    from hedera_etl_spark.operators.components import collapse_components
    from hedera_etl_spark.operators.textdedup import minhash_lsh_neardups

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, text_a),
            (2, text_a),            # clone of 1
            (3, text_a + " tail"),  # near-dup of 1 (and transitively of 2)
            (4, "completely different words in this one here now"),
        ],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_neardups(docs, threshold=0.5).select("doc_a", "doc_b")
    rows = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in collapse_components(docs.select("doc_id"), pairs).collect()
    }
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False), 4: (4, True)}


def test_nonconvergence_rail_raises(spark):
    from hedera_etl_spark.operators.components import connected_components

    df = spark.createDataFrame([(i, i + 1) for i in range(23)], "src LONG, dst LONG")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=1)
