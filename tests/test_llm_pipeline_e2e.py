"""End-to-end LLM training-data pipeline over the documents table:

    exact dedup -> near-dup collapse (MinHash+LSH -> connected
    components) -> quality filter -> deterministic sample -> sequence
    packing -> shard export -> integrity verify

One test composing the real operators back to back — the contract that
each stage's output schema is the next stage's input, and that the
pipeline's global invariants (no duplicate content survives, every
surviving doc is packed exactly once, every exported shard verifies)
hold simultaneously, not just per-operator."""

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.components import collapse_components
from hedera_etl_spark.operators.export import export_shards, verify_shards
from hedera_etl_spark.operators.packing import pack_sequences
from hedera_etl_spark.operators.sampling import hash_sample
from hedera_etl_spark.operators.textanalysis import quality_scores
from hedera_etl_spark.operators.textdedup import exact_duplicates, minhash_lsh_neardups

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    """sf0.001 documents plus injected exact clones and near-dup variants."""
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    first_two = base.orderBy("doc_id").limit(2).collect()
    d0, d1 = first_two[0], first_two[1]
    injected = spark.createDataFrame(
        [
            (1_000_001, d0["text"]),  # exact clones of doc 0
            (1_000_002, d0["text"]),
            (1_000_003, d1["text"] + " tailA tailB"),  # near-dups of doc 1
            (1_000_004, d1["text"] + " tailC tailD"),
        ],
        ["doc_id", "text"],
    )
    return base.unionByName(injected), d0["doc_id"], d1["doc_id"]


def run_pipeline(spark, docs):
    # 1. exact dedup: min-id keeper per distinct content
    keepers = exact_duplicates(docs).select(F.col("keep_id").alias("doc_id"))
    exact_survivors = docs.join(keepers, "doc_id", "left_semi")

    # 2. near-dup pairs -> transitive collapse -> min-id keeper per cluster
    pairs = minhash_lsh_neardups(exact_survivors, n=3, k=9, bands=3, threshold=0.5)
    decision = collapse_components(exact_survivors.select("doc_id"), pairs)
    near_survivors = exact_survivors.join(
        decision.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )

    # 3. quality floor
    q = quality_scores(near_survivors)
    quality_ok = near_survivors.join(
        q.filter(F.col("n_tokens") >= 5).select("doc_id"), "doc_id", "left_semi"
    )

    # 4. deterministic 80% sample
    sampled = hash_sample(quality_ok, ["doc_id"], 0.8, salt="e2e")

    # 5. pack into 256-token contexts
    packed = pack_sequences(sampled, max_tokens=256, n_groups=8)
    return sampled, packed


def test_pipeline_end_to_end(spark, corpus, tmp_path):
    docs, id0, id1 = corpus
    sampled, packed = run_pipeline(spark, docs)
    sampled_rows = sampled.collect()
    survivor_ids = {r["doc_id"] for r in sampled_rows}

    # exact clones collapsed to the min-id original
    assert not {1_000_001, 1_000_002} & survivor_ids
    # near-dup variants collapsed: at most the cluster keeper survives,
    # and the keeper is the min id (the original), never an injected copy
    assert not {1_000_003, 1_000_004} & survivor_ids
    # no two surviving docs share identical content
    texts = [r["text"] for r in sampled_rows]
    assert len(texts) == len(set(texts))

    # packing totality + capacity over the sampled set
    assignments = packed.collect()
    assert sorted(r["doc_id"] for r in assignments) == sorted(survivor_ids)
    fills = {}
    for r in assignments:
        if not r["oversize"]:
            fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    assert fills and all(f <= 256 for f in fills.values())

    # 6. export with per-doc token counts carried along, then verify
    out = str(tmp_path / "export")
    enriched = sampled.join(
        packed.select("doc_id", "n_tokens", "bin_id"), "doc_id"
    )
    export_shards(enriched, out, n_shards=4, token_count_col="n_tokens")
    checks = verify_shards(spark, out).collect()
    assert len(checks) == 4 and all(r["ok"] for r in checks)
    total = spark.read.parquet(f"{out}/shards").count()
    assert total == len(survivor_ids)


def test_pipeline_deterministic(spark, corpus):
    docs, _, _ = corpus
    a, _ = run_pipeline(spark, docs)
    b, _ = run_pipeline(spark, docs)
    assert {r["doc_id"] for r in a.collect()} == {r["doc_id"] for r in b.collect()}
