"""Table maintenance helpers (S8/S9): the Spark forms of the reference's
test-helper SQL templates.

- insert_rows:  INSERT INTO t VALUES (...) — InsertTemplateQuery.java:29-40
- truncate:     DELETE FROM t WHERE 1=1   — TruncateTableTemplateQuery.java:29-38
- row_count:    SELECT count(*) FROM t    — GetRowCountTemplateQuery.java:30

On plain parquet, truncate = overwrite-with-empty (keeping the schema so
subsequent reads/appends still bind); on Delta these become real SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def insert_rows(
    spark: SparkSession,
    path: str,
    rows: list,
    schema,
    partition_by: str | None = None,
) -> None:
    """Append literal rows to a parquet table (S8)."""
    df = spark.createDataFrame(rows, schema)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def truncate(spark: SparkSession, path: str) -> None:
    """Empty the table while preserving its schema (S9).

    Writes an empty DataFrame with the existing schema to a sibling temp
    path, renames the live table aside, renames the empty table in, and
    only then deletes the old copy — at every instant either ``path`` or
    its ``.__old`` sibling holds a complete table (the previous
    rmtree-then-move ordering had a window with NO table at ``path``).
    Renames are same-directory so they stay single-filesystem.
    """
    import os
    import shutil

    schema = spark.read.parquet(path).schema
    tmp, old = path + ".__new", path + ".__old"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def row_count(spark: SparkSession, path: str) -> int:
    """SELECT count(*) (A5/S4)."""
    return spark.read.parquet(path).count()
