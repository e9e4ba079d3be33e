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

    Writes an empty DataFrame with the existing schema to a temp location
    then swaps — same commit pattern as the dedup rewrite, so a crash
    leaves either the old or the (empty) new table, never a half state.
    """
    import shutil
    import tempfile

    schema = spark.read.parquet(path).schema
    tmp = tempfile.mkdtemp(prefix="truncate_")
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)


def row_count(spark: SparkSession, path: str) -> int:
    """SELECT count(*) (A5/S4)."""
    return spark.read.parquet(path).count()
