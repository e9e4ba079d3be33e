"""hedera_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of blockchain-etl/hedera-etl.

The reference (read-only at /root/reference) is a Beam + BigQuery composition:
a streaming JSON->table ingest pipeline (hedera-etl-bigquery) and a scheduled
SQL-template deduplication job (hedera-deduplication-bigquery).  This package
re-expresses that entire surface Spark-first:

- ``schema``     the transactions/errors/state/types data model (StructTypes)
- ``transform``  JSON -> typed rows, derived columns, valid/invalid split
- ``streaming``  Structured Streaming ingest with dead-letter routing
- ``operators``  dedup engine, text dedup (minhash/simhash/jaccard),
                 similarity search, text analysis, multimodal plumbing
- ``queries``    the canonical query registry driven by ``__spark_entry__``
- ``tables``     loaders for the driver-provided parquet tables
- ``session``    SparkSession construction + per-session tuning

Everything here is built on the public PySpark DataFrame/SQL API; no code is
copied from the reference.
"""

__version__ = "0.1.0"

from hedera_etl_spark.session import configure_session, get_spark  # noqa: F401
