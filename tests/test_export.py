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
