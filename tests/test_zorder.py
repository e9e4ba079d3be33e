"""Z-order clustered writes (operators/tablemgmt.write_zordered): files
must be compact in EVERY z-ordered dimension, unlike single-column
clustering which trades all other columns away."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _per_file_span_fraction(spark, path, col, total_span):
    """Mean (max-min)/total_span per output file for ``col`` — the
    fraction of the column's range a file's row-group stats cover (the
    quantity data skipping divides by)."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    rows = (
        df.groupBy("__f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    return sum(float(r["span"]) / total_span for r in rows) / len(rows)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )


def test_zorder_is_compact_in_both_dimensions(spark, events, tmp_path):
    from hedera_etl_spark.operators.tablemgmt import write_zordered

    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "single")
    write_zordered(events, zpath, ["user_id", "value"], n_files=16)
    # baseline: single-column clustering on user_id only
    (
        events.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    lohi = events.agg(
        F.max("user_id") - F.min("user_id"), F.max("value") - F.min("value")
    ).collect()[0]
    uspan, vspan = float(lohi[0]), float(lohi[1])

    z_user = _per_file_span_fraction(spark, zpath, "user_id", uspan)
    z_val = _per_file_span_fraction(spark, zpath, "value", vspan)
    s_user = _per_file_span_fraction(spark, spath, "user_id", uspan)
    s_val = _per_file_span_fraction(spark, spath, "value", vspan)

    # single-column layout: near-perfect on user_id, poor on value
    # (measured ~0.06 / ~0.67 on this data)
    assert s_user < 0.2
    assert s_val > 0.5
    # z-order: compact on BOTH dimensions (measured ~0.27 / ~0.22), and
    # at least halves the value-column span the baseline leaves behind
    assert z_user < 0.4, z_user
    assert z_val < 0.4, z_val
    assert z_val < s_val / 2, (z_val, s_val)
    # and the whole dataset round-trips
    assert spark.read.parquet(zpath).count() == events.count()


def test_zorder_value_interleaves_bits(spark):
    from hedera_etl_spark.operators.tablemgmt import zorder_value

    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], ["a", "b"])
    out = df.select(
        zorder_value([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()
    # a occupies even bit positions, b odd: (3,0)->0b0101=5, (0,3)->0b1010=10,
    # (3,3)->0b1111=15
    assert [r["z"] for r in out] == [5, 10, 15]


def test_degenerate_constant_column(spark, tmp_path):
    """A constant z-column must not crash (zero span -> scale 0)."""
    from hedera_etl_spark.operators.tablemgmt import write_zordered

    df = spark.range(100).select(
        F.col("id"), F.lit(7).alias("const")
    )
    path = str(tmp_path / "zc")
    write_zordered(df, path, ["id", "const"], n_files=4)
    assert spark.read.parquet(path).count() == 100
