"""Loaders for the driver-provided parquet tables (/root/testdata/sf*).

All queries in the registry read through ``load_table`` / ``register_views``
so that schema quirks are normalized in exactly one place:

- ``events.ts`` has shipped in two parquet physical flavors across driver
  fixture generations, and ``normalize_events`` type-dispatches on how the
  column actually scans rather than assuming either:

  * TIMESTAMP(NANOS): Spark cannot scan it natively; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as int64 nanos.  We
    keep the raw nanos as ``ts_ns`` (the reference keeps nano timestamps as
    INT64 too — reference transactions-schema.json:7-10) and derive the
    microsecond-truncated ``ts`` exactly like the reference's
    ``consensusTimestampTruncated`` derivation
    (TransactionJsonToTableRow.java:57-58): ``timestamp_micros(ts_ns div
    1000)``, cast to TIMESTAMP_NTZ so values match what DuckDB sees.
  * TIMESTAMP(MICROS): scans natively as TIMESTAMP_NTZ (or TIMESTAMP under
    int96/other writer settings).  ``ts`` is kept and ``ts_ns`` is derived
    as ``unix_micros(cast(ts AS TIMESTAMP)) * 1000`` — byte-identical to
    DuckDB's ``epoch_ns(ts)`` with the session TZ pinned UTC.

  Either way every consumer sees the same contract: ``ts`` TIMESTAMP_NTZ at
  microsecond precision plus ``ts_ns`` int64 nanoseconds.
- every other table loads as-is (orders/lineitem date columns arrive as
  TIMESTAMP_NTZ already).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_etl_spark.session import configure_session

#: Tables the driver materializes per scale factor (TESTDATA.md).
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


#: (session -> {(sf_dir, name) -> DataFrame}).  A DataFrame is an immutable
#: logical plan — handing the same object out again skips ~100 ms of
#: py4j/plan construction per load without touching execution semantics
#: (every action still re-plans and re-executes the full query; this is
#: NOT the rejected "prepared plan" shuffle reuse, see docs/PERF_NOTES.md).
#: WeakKeyDictionary so a stopped session's plans are collectable.
_TABLE_CACHE = None


#: Canonical events column order after normalization.
_EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"]


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize an events scan (batch OR streaming) to the engine contract:
    ``ts`` TIMESTAMP_NTZ at microsecond precision + ``ts_ns`` int64 nanos.

    Dispatches on how ``ts`` actually scanned, so the engine survives the
    fixture flipping between parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    (it has done both).  Pure column expressions — valid on streaming
    DataFrames too, which is why the streaming readers route through here
    instead of duplicating the logic.
    """
    ts_type = dict(df.dtypes).get("ts")
    if "ts_ns" in df.columns and ts_type == "timestamp_ntz":
        # already normalized: re-deriving ts_ns from the µs-truncated ts
        # would silently drop sub-microsecond digits
        return df.select(*_EVENTS_COLS)
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) scanned under spark.sql.legacy.parquet.nanosAsLong
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)"),
        )
    elif ts_type is not None and ts_type.startswith("timestamp"):
        # TIMESTAMP(MICROS) scans natively; session TZ pinned UTC makes the
        # NTZ->TIMESTAMP cast an identity on the underlying micros, so this
        # matches DuckDB epoch_ns(ts) exactly.
        df = df.withColumn("ts_ns", F.expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
        if ts_type != "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    else:
        raise TypeError(f"events.ts scanned as unsupported type {ts_type!r}")
    return df.select(*_EVENTS_COLS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing the events timestamp column."""
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        import weakref

        _TABLE_CACHE = weakref.WeakKeyDictionary()
    cached = _TABLE_CACHE.setdefault(spark, {}).get((sf_dir, name))
    if cached is not None:
        return cached
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events(df)
    _TABLE_CACHE[spark][(sf_dir, name)] = df
    return df


#: ``ensure_parallelism`` probes partitioning via ``df.rdd``, which forces
#: FULL physical planning of the frame — ~50 ms on a bare scan, SECONDS on a
#: composed pipeline plan (the r15 pack_sequences regression, fixed per call
#: site in d416e3f; this guard makes it structural).  A frame with more
#: logical nodes than this is composed: it already contains its own
#: exchanges, so the probe is skipped and the frame passes through untouched.
_PROBE_MAX_PLAN_NODES = 12


def _probe_is_safe(df: DataFrame, limit: int) -> bool:
    """Whether the ``.rdd`` partition probe is cheap for this frame.

    Walks the ANALYZED plan — already computed eagerly when the DataFrame
    was constructed — and never touches optimization or physical planning;
    cost is a handful of py4j calls for small plans, bounded by ``limit``
    for big ones.  Unsafe when:

    - the plan exceeds ``limit`` nodes (composed pipeline: the probe would
      force full physical planning, seconds of driver time), or
    - any leaf is a ``LogicalRDD`` (a checkpointed upstream: its
      partitioning came from real shuffles already, and under AQE the
      probe can trigger actual stage EXECUTION of everything between the
      checkpoint and this frame just to learn a partition count).
    """
    stack = [df._jdf.queryExecution().analyzed()]
    n = 0
    while stack:
        node = stack.pop()
        n += 1
        if n > limit:
            return False
        children = node.children()
        size = children.size()
        if size == 0 and node.getClass().getSimpleName() == "LogicalRDD":
            return False
        for i in range(size):
            stack.append(children.apply(i))
    return True


def ensure_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Small-file guard for CPU-heavy per-row stages.

    A parquet file is splittable only at row-group boundaries, so a small
    table (or one written with large row groups) can scan as a SINGLE
    task — and any expensive per-row compute chained onto that scan (md5
    shingling, from_json over a wide schema, per-token hashing) runs on
    one core while the rest idle.  This repartitions up to the session's
    default parallelism, but ONLY when the current plan has fewer
    partitions — on a production table with thousands of splits it is a
    no-op and costs no shuffle.  The shuffle it does introduce moves the
    raw input rows once, which is negligible next to the per-row compute
    it parallelizes (that trade is exactly why you'd do the same on a
    cluster when input files are few).

    ``by``: optional hash-partition columns.  When the downstream
    join/aggregate keys on exactly these columns, the spread shuffle IS
    the key exchange the plan needed anyway — Catalyst elides the later
    ENSURE_REQUIREMENTS exchange, so the parallelism comes for free
    (q07's join+agg on l_orderkey is the canonical use).  Without ``by``,
    round-robin — the only safe choice when downstream keys are skewed or
    low-cardinality (e.g. 5 distinct group values must not collapse the
    spread to 5 partitions).
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # memoized per DataFrame object: the .rdd conversion below eagerly
    # builds the physical plan (~50 ms of driver time per call), and
    # load_table hands out long-lived cached objects, so the answer for a
    # given (df, n, by) never changes
    key = f"_hes_ensured_{n}_{'_'.join(by) if by else ''}"
    cached = getattr(df, key, None)
    if cached is None:
        if not _probe_is_safe(df, _PROBE_MAX_PLAN_NODES):
            # Composed or checkpoint-rooted plan: the .rdd probe below
            # would force seconds of single-threaded physical planning —
            # or, under AQE, actual stage execution — on the driver
            # (guide §7.3), and such a frame already carries its own
            # exchanges — pass it through untouched.
            cached = df
        elif df.rdd.getNumPartitions() < n:
            cached = df.repartition(n, *by) if by else df.repartition(n)
        else:
            cached = df
        setattr(df, key, cached)
    return cached


def bounded_sort(df: DataFrame, *cols) -> DataFrame:
    """Total-order presentation sort for outputs whose cardinality is
    BOUNDED by query semantics (a fixed group grid, a top-k, a time-grid
    rollup) rather than by data size.

    ``orderBy`` plans a RangePartitioning exchange, which costs a separate
    sampling pass over the child plus a shuffle — the right plan when the
    sorted set can be huge, pure overhead when the query's own semantics
    cap it (25 region x nation groups, 5 priorities, q x k neighbors).
    This sorts the merged output in ONE task instead — the same judgment
    Catalyst itself encodes as TakeOrderedAndProject for LIMIT queries —
    while everything below the preceding exchange keeps its parallelism
    (partial aggregation still runs map-side on every core).

    Use ONLY when (a) a shuffle sits between the big data and this sort —
    ``coalesce(1)`` narrows the plan all the way down to the previous
    exchange, so without one it would serialize the whole query — and
    (b) the output is semantically bounded; data-proportional results
    (scans, per-row derivations, fact-sized joins) keep ``orderBy``.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view (same names DuckDB pre-registers)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
