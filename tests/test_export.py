"""Shard export: one file per shard, manifest integrity, deterministic
membership, verify_shards round-trip, and corruption detection."""

import glob

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.export import export_shards, shard_id, verify_shards

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    manifest = export_shards(docs, out, n_shards=8, token_count_col=None)
    return out, docs, manifest.collect()


def test_one_file_per_shard(exported):
    out, docs, manifest = exported
    for r in manifest:
        files = glob.glob(f"{out}/shards/shard_id={r['shard_id']}/*.parquet")
        assert len(files) == 1, files


def test_manifest_totals_match_input(exported):
    out, docs, manifest = exported
    assert sum(r["n_rows"] for r in manifest) == docs.count()
    assert sorted(r["shard_id"] for r in manifest) == list(range(8))


def test_roundtrip_preserves_rows(spark, exported):
    out, docs, _ = exported
    back = spark.read.parquet(f"{out}/shards").drop("shard_id")
    assert back.count() == docs.count()
    # content equality via symmetric difference on all columns
    assert back.exceptAll(docs.select(back.columns)).count() == 0
    assert docs.select(back.columns).exceptAll(back).count() == 0


def test_verify_shards_all_ok(spark, exported):
    out, _, manifest = exported
    rows = verify_shards(spark, out).collect()
    assert len(rows) == len(manifest) and all(r["ok"] for r in rows)


def test_membership_deterministic_and_total(spark, exported):
    _, docs, _ = exported
    a = docs.select("doc_id", shard_id("doc_id", 8).alias("s")).collect()
    b = docs.select("doc_id", shard_id("doc_id", 8).alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["s"] < 8 for r in a)


def test_verify_detects_tampering(spark, tmp_path):
    out = str(tmp_path / "exp")
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    export_shards(docs, out, n_shards=4)
    # overwrite one shard's file with different content
    victim = glob.glob(f"{out}/shards/shard_id=2/*.parquet")[0]
    spark.createDataFrame([(999, "tampered")], ["doc_id", "text"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "fake"))
    fake = glob.glob(str(tmp_path / "fake" / "*.parquet"))[0]
    import os
    import shutil

    shutil.copyfile(fake, victim)
    # drop Hadoop's transport-CRC sidecar: a tamper that repairs the file
    # CRC is precisely what the manifest's CONTENT checksum must catch
    for crc in glob.glob(f"{out}/shards/shard_id=2/.*.crc"):
        os.remove(crc)
    rows = {r["shard_id"]: r["ok"] for r in verify_shards(spark, out).collect()}
    assert rows[2] is False
    assert all(ok for s, ok in rows.items() if s != 2)


def test_jsonl_export_verifies_and_orders_deterministically(spark, tmp_path):
    from pyspark.sql import types as T

    from hedera_etl_spark.operators.export import export_shards, verify_shards

    df = spark.createDataFrame(
        [(i, f"doc text {i}", i * 10) for i in range(200)],
        ["doc_id", "text", "n_tokens"],
    )
    out = str(tmp_path / "jl")
    export_shards(
        df, out, n_shards=4, token_count_col="n_tokens",
        fmt="jsonl", shuffle_salt="curriculum-v1",
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    v = verify_shards(spark, out, fmt="jsonl", schema=schema)
    assert v.count() == 4 and v.filter("NOT ok").count() == 0
    # every line is standalone JSON a non-Spark loader can consume
    import glob
    import json

    files = glob.glob(f"{out}/shards/shard_id=*/part-*")
    assert len(files) == 4
    line = open(files[0]).readline()
    obj = json.loads(line)
    assert set(obj) == {"doc_id", "text", "n_tokens"}

    # the within-shard order is the salt-determined shuffle: re-export
    # with the same salt reproduces it byte-for-byte
    out2 = str(tmp_path / "jl2")
    export_shards(
        df, out2, n_shards=4, token_count_col="n_tokens",
        fmt="jsonl", shuffle_salt="curriculum-v1",
    )
    import hashlib

    def digest(root):
        h = hashlib.md5()
        for f in sorted(glob.glob(f"{root}/shards/shard_id=*/part-*")):
            rel_dir = f.split("/")[-2]
            h.update(rel_dir.encode())
            h.update(open(f, "rb").read())
        return h.hexdigest()

    assert digest(out) == digest(out2)

    # a different salt yields a different (but still verifying) order
    out3 = str(tmp_path / "jl3")
    export_shards(
        df, out3, n_shards=4, token_count_col="n_tokens",
        fmt="jsonl", shuffle_salt="curriculum-v2",
    )
    assert digest(out3) != digest(out)
    assert verify_shards(spark, out3, fmt="jsonl", schema=schema).filter("NOT ok").count() == 0
