"""Maintenance helpers (S8/S9) + archive sink (S5) tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from hedera_etl_spark.operators.maintenance import insert_rows, row_count, truncate

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def test_insert_and_count(spark, tmp_path):
    path = str(tmp_path / "t")
    insert_rows(spark, path, [(1, "a"), (2, "b")], SCHEMA)
    insert_rows(spark, path, [(3, "c")], SCHEMA)
    assert row_count(spark, path) == 3


def test_truncate_preserves_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    insert_rows(spark, path, [(1, "a")], SCHEMA)
    truncate(spark, path)
    df = spark.read.parquet(path)
    assert df.count() == 0
    assert df.schema == SCHEMA
    # appends still bind after truncate
    insert_rows(spark, path, [(9, "z")], SCHEMA)
    assert row_count(spark, path) == 1


def test_archive_sink_keeps_raw_lines(spark, tmp_path):
    from hedera_etl_spark.streaming.ingest import IngestPipeline

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    lines = [
        json.dumps({"consensusTimestamp": 1_570_800_000_000_000_000 + i,
                    "transactionType": 7})
        for i in range(5)
    ] + ["{corrupt"]
    (input_dir / "f.json").write_text("\n".join(lines))

    archive = str(tmp_path / "archive")
    pipe = IngestPipeline(
        spark,
        str(input_dir),
        str(tmp_path / "table"),
        str(tmp_path / "errors"),
        str(tmp_path / "ckpt"),
        archive_path=archive,
    )
    pipe.run_to_completion()

    archived = {r["value"] for r in spark.read.text(archive).collect()}
    # every raw line — valid AND corrupt — lands in the cold archive
    assert archived == set(lines)
    assert os.path.exists(archive)


def test_truncate_crash_leaves_a_complete_table(spark, tmp_path, monkeypatch):
    """Kill truncate between its two renames: the old table must survive
    under the .__old sibling (the pre-fix rmtree-then-move ordering had a
    window with NO table on disk)."""
    import os as _os

    import pytest

    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)

    real_rename = _os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the tmp -> live rename
            raise OSError("injected crash")
        return real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", failing_rename)
    with pytest.raises(OSError):
        truncate(spark, path)
    monkeypatch.undo()
    from hedera_etl_spark.fsutil import old_sibling

    assert spark.read.parquet(old_sibling(path)).count() == 10
    # and the next truncate self-heals the window, then completes
    truncate(spark, path)
    assert spark.read.parquet(path).count() == 0


def test_cli_ingest_and_dedupe_roundtrip(spark, tmp_path, monkeypatch, capsys):
    """The CLI mains (HederaETLApplication / DedupeApplication parity):
    ingest a JSON file, then dedupe the produced table — both through
    argv parsing, reusing the live session via get_spark's getOrCreate."""
    import json

    from hedera_etl_spark import cli

    lines = [
        json.dumps(
            {
                "consensusTimestamp": 1_570_800_000_000_000_000 + i * 1_000_000_000,
                "transactionType": 7,
                "transaction": {"body": {"transactionFee": str(i), "memo": f"m{i}"}},
            }
        )
        for i in range(8)
    ] + [
        json.dumps(
            {
                "consensusTimestamp": 1_570_800_000_000_000_000,
                "transactionType": 7,
                "transaction": {"body": {"transactionFee": "0", "memo": "m0"}},
            }
        )
    ]
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "f.json").write_text("\n".join(lines))

    table = str(tmp_path / "tx")
    rc = cli.main(
        [
            "ingest",
            "--input-dir", str(indir),
            "--transactions-table", table,
            "--errors-table", str(tmp_path / "err"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--no-dedupe",  # keep the replay so dedupe has work to do
        ]
    )
    assert rc == 0
    assert "valid_rows=9" in capsys.readouterr().out
    assert spark.read.parquet(table).count() == 9

    # defaults must match the ingest-produced table: no flag overrides
    rc = cli.main(["dedupe", "--table", table, "--state", str(tmp_path / "state")])
    assert rc == 0
    assert "duplicates_removed=1" in capsys.readouterr().out
    assert spark.read.parquet(table).count() == 8


def test_compact_partitions_merges_small_files(spark, tmp_path):
    """Many micro-batch appends -> one file per partition, same rows,
    cluster ordering restored, crash-safe commit path."""
    import glob

    from pyspark.sql import functions as F

    from hedera_etl_spark.operators.tablemgmt import compact_partitions

    path = str(tmp_path / "t")
    # 6 appends of 2 partitions each -> 12+ small files
    for i in range(6):
        df = spark.createDataFrame(
            [(i * 10 + j, "2021-01-0%d" % (1 + j % 2), (7 * i + j) % 5)
             for j in range(4)],
            ["id", "d", "ttype"],
        ).select("id", F.col("d").cast("date").alias("part_date"), "ttype")
        df.repartition(2).write.mode("append").partitionBy("part_date").parquet(path)

    before = spark.read.parquet(path)
    n_before = before.count()
    rows_before = {tuple(r) for r in before.collect()}
    assert len(glob.glob(f"{path}/part_date=*/part-*")) > 2

    # default skip_latest leaves the active (greatest) partition alone
    out = compact_partitions(spark, path, target_files_per_partition=1, cluster_by="ttype")
    assert set(out) == {"2021-01-01"}
    # with no live writer, compact everything
    out = compact_partitions(
        spark, path, target_files_per_partition=1, cluster_by="ttype", skip_latest=False
    )
    assert set(out) == {"2021-01-02"}

    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert {tuple(r) for r in after.collect()} == rows_before
    for part in glob.glob(f"{path}/part_date=*"):
        files = [f for f in glob.glob(part + "/part-*")]
        assert len(files) == 1, part
        # clustering restored: ttype sorted within the single file
        import pyarrow.parquet as pq

        vals = pq.read_table(files[0], columns=["ttype"])["ttype"].to_pylist()
        assert vals == sorted(vals)
    # idempotent: second run touches nothing
    assert compact_partitions(
        spark, path, target_files_per_partition=1, skip_latest=False
    ) == {}


def test_compact_abort_on_concurrent_append(spark, tmp_path, monkeypatch):
    """A writer appending to a partition DURING its rewrite (late events
    land in historic partitions too) must not lose the new file: the
    pre-swap listing guard aborts the swap, the retry re-reads, and a
    persistent racer leaves the partition uncompacted with every file
    intact."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from hedera_etl_spark import fsutil
    from hedera_etl_spark.operators import tablemgmt

    path = str(tmp_path / "t")
    for i in range(3):
        df = spark.createDataFrame(
            [(i * 10 + j, "2021-01-01", j % 5) for j in range(4)],
            ["id", "d", "ttype"],
        ).select("id", F.col("d").cast("date").alias("part_date"), "ttype")
        df.repartition(2).write.mode("append").partitionBy("part_date").parquet(path)

    part = glob.glob(f"{path}/part_date=*")[0]
    donor = sorted(glob.glob(part + "/part-*"))[0]
    import pyarrow.parquet as pq

    donor_rows = pq.read_table(donor).num_rows

    real_atomic_replace = fsutil.atomic_replace
    injected = []

    def racing_atomic_replace(p, write_fn, abort_unless=None):
        # simulate the concurrent writer: a new data file lands after the
        # read snapshot, before the swap
        dst = f"{part}/part-late-{len(injected)}.parquet"
        shutil.copy(donor, dst)
        injected.append(dst)
        return real_atomic_replace(p, write_fn, abort_unless)

    # compact_partitions imports atomic_replace from fsutil at call time
    monkeypatch.setattr(fsutil, "atomic_replace", racing_atomic_replace)
    n_before = spark.read.parquet(path).count()
    out = tablemgmt.compact_partitions(
        spark, path, target_files_per_partition=1, skip_latest=False, cluster_by=None
    )
    # raced on both attempts -> compaction declined, nothing lost
    assert out == {}
    assert len(injected) == 2
    for f in injected:
        import os

        assert os.path.exists(f)
    assert spark.read.parquet(path).count() == n_before + 2 * donor_rows


def test_compact_partitions_heals_crash_debris(spark, tmp_path):
    """Swap siblings from a crashed run are healed, never treated as
    partitions (a visible part_date=X.__old would be read as a partition
    with a garbage value), and a missing live dir is restored."""
    import glob
    import os as _os

    from pyspark.sql import functions as F

    from hedera_etl_spark.fsutil import new_sibling, old_sibling
    from hedera_etl_spark.operators.tablemgmt import compact_partitions

    path = str(tmp_path / "t")
    for i in range(2):
        spark.createDataFrame(
            [(i, "2021-01-01", 1), (i, "2021-01-02", 2)], ["id", "d", "ttype"]
        ).select("id", F.col("d").cast("date").alias("part_date"), "ttype").write.mode(
            "append"
        ).partitionBy("part_date").parquet(path)
    n_rows = spark.read.parquet(path).count()

    live = _os.path.join(path, "part_date=2021-01-01")
    # crash window: live renamed aside, replacement never arrived
    _os.rename(live, old_sibling(live))
    # plus a half-written temp for the other partition
    _os.makedirs(new_sibling(_os.path.join(path, "part_date=2021-01-02")))

    out = compact_partitions(spark, path, skip_latest=False, cluster_by=None)
    assert set(out) <= {"2021-01-01", "2021-01-02"}
    assert spark.read.parquet(path).count() == n_rows  # nothing lost
    assert not glob.glob(f"{path}/.part_date=*")  # debris gone
    # no garbage partition values leaked into discovery
    dates = {str(r[0]) for r in spark.read.parquet(path).select("part_date").distinct().collect()}
    assert dates == {"2021-01-01", "2021-01-02"}


def test_row_count_heals_crashed_swap(spark, tmp_path, monkeypatch):
    """A reader entry point must self-repair the rename crash window."""
    import os as _os

    import pytest

    from hedera_etl_spark.fsutil import old_sibling

    path = str(tmp_path / "t")
    spark.range(7).write.parquet(path)
    _os.rename(path, old_sibling(path))  # simulate the crash window
    assert row_count(spark, path) == 7  # healed, not PATH_NOT_FOUND
    assert _os.path.exists(path) and not _os.path.exists(old_sibling(path))


def test_compact_explicit_partitions_override_skip_latest(spark, tmp_path):
    """An explicit partitions list must compact even the greatest
    partition (the caller asserts it is writer-safe)."""
    from pyspark.sql import functions as F

    from hedera_etl_spark.operators.tablemgmt import compact_partitions

    path = str(tmp_path / "t")
    for i in range(3):
        spark.createDataFrame(
            [(i, "2021-01-02", 1)], ["id", "d", "ttype"]
        ).select("id", F.col("d").cast("date").alias("part_date"), "ttype").write.mode(
            "append"
        ).partitionBy("part_date").parquet(path)
    out = compact_partitions(
        spark, path, target_files_per_partition=1, partitions=["2021-01-02"]
    )
    assert set(out) == {"2021-01-02"}


def test_heal_recognizes_legacy_sibling_name(spark, tmp_path):
    """Debris written by the pre-dot-prefix protocol version still
    self-repairs."""
    import os as _os

    path = str(tmp_path / "t")
    spark.range(5).write.parquet(path)
    _os.rename(path, path + ".__old")  # legacy visible sibling
    assert row_count(spark, path) == 5  # healed through the legacy name
    assert not _os.path.exists(path + ".__old")
