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
    """Append literal rows to a parquet table (S8).  Heals a crashed
    swap window first (fsutil contract: every entry point heals)."""
    from hedera_etl_spark.fsutil import heal

    heal(path)
    df = spark.createDataFrame(rows, schema)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def truncate(spark: SparkSession, path: str) -> None:
    """Empty the table while preserving its schema (S9).

    Uses the shared ``fsutil.atomic_replace`` protocol: at every instant
    either ``path`` or its ``.__old`` sibling holds a complete table (the
    original rmtree-then-move ordering had a window with NO table at
    ``path``), and a crash window left by a previous writer self-heals on
    the next call.  Renames are same-directory so they stay
    single-filesystem.
    """
    from hedera_etl_spark.fsutil import atomic_replace, heal

    heal(path)
    schema = spark.read.parquet(path).schema
    atomic_replace(
        path,
        lambda tmp: spark.createDataFrame([], schema).write.mode("overwrite").parquet(tmp),
    )




def row_count(spark: SparkSession, path: str) -> int:
    """SELECT count(*) (A5/S4).  Heals a crashed swap window first."""
    from hedera_etl_spark.fsutil import heal

    heal(path)
    return spark.read.parquet(path).count()
