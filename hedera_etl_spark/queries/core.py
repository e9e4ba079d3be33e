"""Core relational query set (SURVEY.md §2.9 Q01-Q16).

These exercise every operator class the reference uses plus the analytics
surface it delegates to BigQuery: scan/filter/project, hash aggregate with
HAVING (GetDuplicatesTemplateQuery.java:33-36 shape), first-row-per-group
dedup (RemoveDuplicatesTemplateQuery.java:29-43 shape), min/max probes
(GetNextTimestampTemplateQuery.java:29-30), dimension joins, semi/anti joins,
big joins with top-k, theta/range joins, ranking and frame windows, set ops,
rollup, scalar functions, explode over repeated data, and tumbling windows.

Scale notes are in each docstring: which side broadcasts, where the shuffle
lands, and what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hedera_etl_spark.queries import query
from hedera_etl_spark.tables import bounded_sort, ensure_parallelism, load_table

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# Q01 — scan + filter + project (S4/P5)
# ---------------------------------------------------------------------------
@query(
    "q01_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 30 AND 45
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scan", "filter", "project"),
    bench=True,
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan: predicate + projection must both reach the parquet
    reader (PushedFilters / 3-column ReadSchema in the physical plan).
    Reference analogue: the universal time-range predicate P5
    (GetDuplicatesTemplateQuery.java:35)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity").between(30, 45))
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Q02 — hash aggregate + HAVING (A1, the GetDuplicates shape)
# ---------------------------------------------------------------------------
@query(
    "q02_groupby_having",
    """
    SELECT o_custkey, COUNT(*) AS num,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_urgent,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 12
    ORDER BY o_custkey
    """,
    tags=("aggregate", "having", "listagg"),
    bench=True,
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-detection aggregate: GROUP BY key HAVING count>N — the exact
    shape of GetDuplicatesTemplateQuery.java:33-36.  Rides the
    aggregate-flavor surface: conditional aggregate (SUM CASE — the
    count_if shape), grouped COUNT(DISTINCT), and ordered listagg.

    r15 optimization round (guide §2.3, aggregate before you shuffle):
    the direct one-level form fed collect_list(o_orderpriority) — every
    input ROW as a string in an ObjectHashAggregate buffer — through
    BOTH exchanges of the COUNT(DISTINCT) two-level rewrite.  This form
    aggregates to (custkey, priority, count) first — a codegen
    HashAggregate with narrow longs whose map-side combine ships one row
    per (custkey, priority) — then derives every output from the counts:
    num = SUM(c), n_urgent = the URGENT count, n_prios = COUNT(*), and
    the ordered listagg rebuilds the sorted occurrence list as
    array_repeat per priority (sorting the distinct priorities groups
    equal values exactly as sorting the full multiset would, so the
    joined string is byte-identical).  The only object buffer left is a
    <=#distinct-priorities collect_list at the second level, and the
    distinct-rewrite's Expand disappears (n_prios is free)."""
    orders = load_table(spark, sf_dir, "orders")
    per_prio = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("__c")
    )
    return (
        per_prio.groupBy("o_custkey")
        .agg(
            F.sum("__c").alias("num"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("__c")).otherwise(
                    0
                )
            ).alias("n_urgent"),
            # count the COLUMN, not the rows (ADVICE r15 #1): each
            # per_prio row is one distinct (custkey, priority), but the
            # oracle's COUNT(DISTINCT o_orderpriority) excludes NULLs —
            # count(col) skips a NULL-priority group identically
            # (unreachable on TPC-H data, where the column is NOT NULL)
            F.count("o_orderpriority").alias("n_prios"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("o_orderpriority", "__c"))
                        ),
                        lambda s: F.array_repeat(
                            s["o_orderpriority"], s["__c"].cast("int")
                        ),
                    )
                ),
                ",",
            ).alias("prios"),
        )
        .filter(F.col("num") > 12)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Q03 — first-row-per-group dedup (A2/J1, the RemoveDuplicates shape)
# ---------------------------------------------------------------------------
_DUPED_EVENTS_SQL = """
    SELECT event_id, ts, user_id, event_type, value, 0 AS ingest_seq FROM events
    UNION ALL
    SELECT event_id, ts, user_id, event_type, value, 1 AS ingest_seq
    FROM events WHERE event_id % 5 = 0
"""


def duped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with every 5th row duplicated — port of the reference
    integration-test generator (TransactionsGenerator.java:70-81: every 5th
    transaction inserted twice), with a deterministic ingest_seq tiebreaker
    replacing the reference's arbitrary-row choice
    (RemoveDuplicatesTemplateQuery.java:33)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # ONE scan: each row explodes to its copies (replays get seq 0 and 1)
    # — the union-of-filtered form read events twice (measured 0.55 s ->
    # 0.36 s at sf0.1), and at scale a second fact scan is pure waste
    return ev.select(
        "*",
        F.explode(
            F.when(F.col("event_id") % 5 == 0, F.array(F.lit(0), F.lit(1))).otherwise(
                F.array(F.lit(0))
            )
        ).alias("ingest_seq"),
    )


@query(
    "q03_dedup_first_per_group",
    f"""
    WITH dups AS ({_DUPED_EVENTS_SQL})
    SELECT event_id, ts, user_id, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ingest_seq) AS rn
      FROM dups
    )
    WHERE rn = 1
    ORDER BY event_id
    """,
    tags=("dedup", "window"),
    # rotated back IN r14 (VERDICT r13 #1 — r10-stale cohort).
    bench=True,
    # Driver-green r14; parked r15: A2 first-per-group stays driver-checked
    # via hed_dedupe_pipeline (IN), whose r14-upgraded oracle IS the full
    # ROW_NUMBER()=1 relation hashed row-by-row; keeps its bench slot.
    driver_visible=False,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep exactly one row per key with a deterministic tiebreak —
    row_number()==1, the Spark-native form of
    RemoveDuplicatesTemplateQuery.java:32-37's ARRAY_AGG(x LIMIT 1).
    One shuffle on the dedup key; at scale the same plan services
    arbitrarily large inputs since state is per-key-group."""
    w = W.partitionBy("event_id").orderBy("ingest_seq")
    return (
        duped_events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q04 — ungrouped MIN/MAX probes (A3/A4)
# ---------------------------------------------------------------------------
@query(
    "q04_minmax_probe",
    """
    SELECT CAST(MIN(o_orderdate) AS DATE) AS min_date,
           CAST(MAX(o_orderdate) AS DATE) AS max_date,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderdate > TIMESTAMP '1995-06-01 00:00:00'
    """,
    tags=("aggregate",),
    # Driver-green r14; parked r15: ungrouped MIN/MAX/COUNT is a strict
    # subset of llm_profile's (IN) one-pass stats (the r7 park rationale);
    # P6 open-ended bounds via q01_filter_project's pushdown pins and
    # q17_asof_join's non-equi bounds (both IN r15).
    driver_visible=False,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup job's window-advance probes: ungrouped MIN over a filtered
    range (GetNextTimestampTemplateQuery.java:29-30) and ungrouped MAX
    (GetLatestDedupeRowTemplateQuery.java:29-30).  Plans as a partial+final
    agg with a one-row shuffle — constant cost at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderdate") > F.lit("1995-06-01 00:00:00").cast("timestamp_ntz")).agg(
        F.min("o_orderdate").cast("date").alias("min_date"),
        F.max("o_orderdate").cast("date").alias("max_date"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Q05 — dimension join + aggregate (J3)
# ---------------------------------------------------------------------------
@query(
    "q05_dim_join_agg",
    f"""
    SELECT r_name, n_name,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_price,
           COUNT(*) AS num_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("join", "broadcast", "aggregate"),
    bench=True,
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readable-analytics dimension chain — the reason transaction_types
    exists in the reference (scripts/create-tables.sh:38-59), extended
    two dimension hops deep (customer -> nation -> region).  Only the
    GENUINELY fixed-size dimensions (nation: 25 rows, region: 5) carry a
    broadcast hint; customer GROWS with the scale factor (sf x 150k
    rows), so a hard hint would force a multi-GB broadcast build at
    cluster scale — it broadcasts here via autoBroadcastJoinThreshold
    (plan-asserted) and degrades gracefully to a shuffled join when it
    outgrows the threshold, with AQE re-electing broadcast at runtime if
    the shuffled size says otherwise."""
    # NO spread: the per-row work below the first exchange is three
    # broadcast-hash probes + a partial agg — cheap enough that
    # round-robin-exchanging the fact to widen it costs twice what it
    # saves (measured 0.74s -> 0.35s at sf0.1 without it); see q08a for
    # the general rule on when spreading pays
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("decimal(28,2)")
            .cast("double")
            .alias("total_price"),
            F.count("*").alias("num_orders"),
        )
        # 25 region x nation groups — semantically bounded output, so the
        # sort skips the RangePartitioning sampling pass (tables.bounded_sort)
        .transform(lambda d: bounded_sort(d, "r_name", "n_name"))
    )


# ---------------------------------------------------------------------------
# Q06 — anti / semi joins
# ---------------------------------------------------------------------------
@query(
    "q06_semi_anti_join",
    """
    SELECT 'semi' AS mode, c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'anti' AS mode, c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY mode, c_custkey
    """,
    tags=("join", "semi", "anti"),
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (no row multiplication, early out) and
    NOT IN / NOT EXISTS as a left-anti join, tagged and unioned into one
    registry entry.  At scale Spark broadcasts the smaller distinct key
    set; with AQE the strategy flips to shuffled hash join automatically
    if the build side grows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select(F.lit("semi").alias("mode"), "c_custkey")
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.lit("anti").alias("mode"), "c_custkey")
    )
    return semi.unionByName(anti).orderBy("mode", "c_custkey")


# ---------------------------------------------------------------------------
# Q07 — big join + aggregate + top-k
# ---------------------------------------------------------------------------
@query(
    "q07_bigjoin_topk",
    """
    SELECT l_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
    ORDER BY rev DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "topk", "aggregate"),
    bench=True,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join + top-k.  The ORDER BY ... LIMIT plans as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver, never a global sort.  Tie-broken on l_orderkey for determinism.

    Two plan decisions the oracle can't see but the wall clock can:

    - ``ensure_parallelism(by=l_orderkey)``: a single-split lineitem scan
      would run the whole join + partial aggregate on ONE task; hashing
      on the join==group key makes the spread shuffle double as the
      aggregate's own exchange (ENSURE_REQUIREMENTS elided — one shuffle
      total), and at scale it is a no-op.
    - The revenue sum runs over integer CENTS, not DECIMAL(18,2):
      sum(round(price*100)::BIGINT)/100.0 is the same exact rational
      (prices are 2-decimal values; the cents are exact integers), and
      IEEE division by 100.0 rounds once — bit-identical to the oracle's
      DECIMAL-sum-then-cast-DOUBLE, at primitive-long aggregation speed
      instead of 128-bit decimal buffers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # No broadcast hint: orders is a FACT table, so a hard hint is a
    # cluster-scale OOM (the planner would be forced to build however big
    # orders grows).  The single-column projection sits well under
    # autoBroadcastJoinThreshold at bench scale, so the planner still
    # elects broadcast there (plan-asserted); past the threshold it
    # degrades to a shuffled join and AQE re-elects broadcast at runtime
    # only if the actual shuffle bytes justify it.
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return (
        ensure_parallelism(li, by=["l_orderkey"])
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / F.lit(100.0))
            .alias("rev")
        )
        .orderBy(F.col("rev").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q08 — theta / range joins
# ---------------------------------------------------------------------------
@query(
    "q08_theta_join",
    """
    SELECT o_orderpriority, COUNT(*) AS late_lines
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "theta"),
    bench=True,
    # parked in r14 (driver-green r13): range/non-equi joins stay
    # driver-checked via q17_asof_join (IN); P6 open-ended bounds via
    # q01_filter_project's BETWEEN + pushdown pins (IN r15; q04 parked
    # r15 into llm_profile); oracle stays in tools/verify_oracle.py +
    # bench.
    driver_visible=False,
)
def q08a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: the equi part drives the shuffle/join
    strategy, the range predicate evaluates as a post-join filter — this is
    the scalable shape (never a nested loop).  Deliberately NO
    ensure_parallelism spread here: the per-row work after the scan is one
    date comparison, so round-robin-exchanging the wide fact just to widen
    a broadcast-join probe costs more than the narrow probe saves
    (measured ~0.35s of the query's ~0.95s at sf0.1); spreading pays only
    ahead of CPU-heavy per-row stages (md5/JSON — see tx/minhash paths).
    At production scale the scan has thousands of splits and Catalyst/AQE
    pick the join strategy from real sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("late_lines"))
        # 5 priority values — bounded output (tables.bounded_sort)
        .transform(lambda d: bounded_sort(d, "o_orderpriority"))
    )


def q08_range_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key) in its broadcast form: Spark plans
    BroadcastNestedLoopJoin with the small side broadcast — acceptable
    because supplier is a dimension.  Not a registry entry (the bucketed
    rewrite below answers the identical oracle); kept for the plan-audit
    test that pins the BNLJ shape."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(supplier)
        .join(
            customer,
            customer.c_acctbal.between(supplier.s_acctbal - 10, supplier.s_acctbal + 10),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
        .orderBy("s_suppkey")
    )


def q08c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join as an equi-join on floor(value/width) buckets (right
    side exploded to bucket ±1, exact residual filter after) — the
    big-joins-big scale path where no side can broadcast
    (operators/joins.py range_join_bucketed).  Not a registry entry since
    r6 (the 50-entry driver window): the rewrite is pinned instead by
    test_plans.test_bucketed_range_join_is_equi_join (plan shape) and
    test_bucketed_range_join_matches_bnlj_form (bit-exact equality with
    the BNLJ form q08_range_join_broadcast, whose BETWEEN predicate is
    the naive oracle semantics)."""
    from hedera_etl_spark.operators.joins import range_join_bucketed

    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    customer = load_table(spark, sf_dir, "customer").select("c_acctbal")
    return (
        range_join_bucketed(supplier, customer, "s_acctbal", "c_acctbal", 10.0)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q09/Q10 — window functions
# ---------------------------------------------------------------------------
@query(
    "q09_window_rank",
    """
    SELECT o_custkey, o_orderkey, r, dr,
           CAST(CAST(pr AS DECIMAL(9,6)) AS DOUBLE) AS pct_rank,
           CAST(CAST(cd AS DECIMAL(9,6)) AS DOUBLE) AS cume,
           nt
    FROM (
      SELECT o_custkey, o_orderkey,
             RANK()         OVER w AS r,
             DENSE_RANK()   OVER w AS dr,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST()    OVER w AS cd,
             CAST(NTILE(4) OVER wt AS BIGINT) AS nt
      FROM orders
      WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
             wt AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE r <= 3
    ORDER BY o_custkey, r, o_orderkey
    """,
    tags=("window", "rank"),
    bench=True,
    # parked in r14 (driver-green r13): the rank-window kernel stays
    # driver-checked via llm_grouped_sample (IN r15 — two-phase grouped
    # top-k over the same exchange; llm_domain_topk parked r15 into it)
    # and the rn=1 case via hed_dedupe_pipeline's full ROW_NUMBER()=1
    # oracle (IN); analytic frames keep q10_window_frame IN.
    driver_visible=False,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ranking window — one shuffle on the partition key,
    sort within partitions, no global sort.  The reference's first-per-group
    dedup (A2) is the rn=1 special case of this.  Carries the full ranking
    family on the same exchange: rank / dense_rank / percent_rank /
    cume_dist over the tie-full ordering, ntile over a TIE-BROKEN ordering
    (o_orderkey appended) — ntile assigns by row position, so a tie-full
    ordering would make its output engine-dependent; the tie-free window
    reuses the same hash exchange with one extra in-partition sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wt = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("r", F.rank().over(w))
        .withColumn("dr", F.dense_rank().over(w))
        .withColumn(
            "pct_rank",
            F.percent_rank().over(w).cast("decimal(9,6)").cast("double"),
        )
        .withColumn(
            "cume", F.cume_dist().over(w).cast("decimal(9,6)").cast("double")
        )
        .withColumn("nt", F.ntile(4).over(wt).cast("long"))
        .filter(F.col("r") <= 3)
        .select("o_custkey", "o_orderkey", "r", "dr", "pct_rank", "cume", "nt")
        .orderBy("o_custkey", "r", "o_orderkey")
    )


@query(
    "q10_window_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(28,2)) AS DOUBLE) AS run_sum,
           lag(o_orderkey)  OVER w AS prev_ok,
           lead(o_orderkey) OVER w AS next_ok,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """,
    tags=("window", "frame", "analytic", "lag-lead"),
    bench=True,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family in one entry: a sliding-frame running
    aggregate (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) plus lag/lead
    offsets and the inter-row gap over the SAME (partition, order) spec —
    the W2 lag/lead surface folded in from the former q22_lag_lead entry
    (r6 registry consolidation), still one shuffle on the partition key
    because every function shares the window ordering.  A total-order
    sort key inside each partition keeps all four outputs deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    ord_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = ord_w.rowsBetween(-2, W.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast("decimal(28,2)")
        .cast("double")
        .alias("run_sum"),
        F.lag("o_orderkey").over(ord_w).alias("prev_ok"),
        F.lead("o_orderkey").over(ord_w).alias("next_ok"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(ord_w)
        ).cast("bigint").alias("days_since_prev"),
        # boundary navigation: first_value over the default running frame;
        # last_value needs the FULL frame (the default frame's last row IS
        # the current row — both engines agree on that trap, so the entry
        # pins the unbounded form users actually want); nth over running
        F.first("o_orderkey").over(ord_w).alias("first_ok"),
        F.last("o_orderkey")
        .over(ord_w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(ord_w).alias("second_ok"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Q11 — set operations
# ---------------------------------------------------------------------------
@query(
    "q11_set_ops",
    """
    SELECT 'intersect' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer
      INTERSECT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'distinct' AS op, c_custkey FROM (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
    )
    ORDER BY op, c_custkey
    """,
    tags=("setop", "distinct"),
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT, EXCEPT and plain DISTINCT, tagged and unioned into one
    entry — all three plan as a shuffle on the full row (the key) with
    hash-based elimination; DISTINCT (the former q20_distinct entry,
    folded in by the r6 registry consolidation) is the degenerate
    single-input case of the same shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    okeys = orders.select(F.col("o_custkey").alias("c_custkey"))
    inter = (
        customer.select("c_custkey")
        .intersect(okeys)
        .select(F.lit("intersect").alias("op"), "c_custkey")
    )
    exc = (
        customer.select("c_custkey")
        .exceptAll(okeys)
        .distinct()
        .select(F.lit("except").alias("op"), "c_custkey")
    )
    dist = okeys.distinct().select(F.lit("distinct").alias("op"), "c_custkey")
    return inter.unionByName(exc).unionByName(dist).orderBy("op", "c_custkey")


# ---------------------------------------------------------------------------
# Q12 — ROLLUP
# ---------------------------------------------------------------------------
@query(
    "q12_rollup",
    """
    SELECT n_name, p_brand, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN part     ON l_partkey = p_partkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, p_brand)
    ORDER BY n_name NULLS FIRST, p_brand NULLS FIRST
    """,
    tags=("rollup", "aggregate", "star-join"),
    # Driver-green r14; parked r15: the EXPAND grouping family stays
    # driver-checked via q19_cube_grouping_sets + q25_pivot (IN r15 —
    # rollup's grouping-set list is a subset of the cube entry's); decimal
    # canon values keep their local oracle; keeps its bench slot.
    driver_visible=False,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate via ROLLUP over a 5-table star join (the
    classic OLAP shape: lineitem fact + orders + part/customer/nation
    dimensions).  The fact-to-fact lineitem-orders join shuffles on the
    order key; every dimension is broadcast, so the fact side shuffles
    exactly once.  NULLS FIRST is explicit because Spark and DuckDB
    default null ordering differently (Spark NULLS FIRST, DuckDB NULLS
    LAST)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    # Pre-aggregate at the leaf grouping, then ROLLUP the tiny aggregate:
    # Spark plans ROLLUP as Expand BEFORE partial aggregation, so a direct
    # rollup triples every fact row map-side (1.8M expanded rows at sf0.1;
    # at 100 TB, 3x the fact through the hash table).  COUNT and a DECIMAL
    # SUM are decomposable, and decimal re-aggregation is exact, so the
    # two-level form is bit-identical (asserted: 1.35 -> 0.77 s at sf0.1)
    # while the Expand touches only |n_name x p_brand| rows.
    leaf = joined.groupBy("n_name", "p_brand").agg(
        F.count("*").alias("__n0"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("__s0"),
    )
    return (
        leaf.rollup("n_name", "p_brand")
        .agg(
            F.sum("__n0").alias("n"),
            F.sum("__s0").cast("decimal(28,2)").cast("double").alias("revenue"),
        )
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("p_brand").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Q13 — scalar function surface
# ---------------------------------------------------------------------------
@query(
    "q13_scalar_functions",
    """
    SELECT o_orderkey,
           UPPER(SUBSTRING(o_orderpriority, 3)) AS prio_name,
           CONCAT(o_orderstatus, '/', o_orderpriority) AS status_prio,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) % 100 AS DOUBLE) AS price_mod,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS DOUBLE) AS price_round,
           CAST(CAST(sqrt(o_totalprice) AS DECIMAL(18,4)) AS DOUBLE) AS price_sqrt,
           o_orderkey % 7 AS key_mod,
           o_orderpriority LIKE '%URGENT' AS is_urgent,
           regexp_extract(o_orderpriority, '[0-9]+') AS prio_num,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           year(o_orderdate) * 10000 + month(o_orderdate) * 100 + dayofmonth(o_orderdate) AS ymd,
           CAST(CAST(abs(o_totalprice - 100000) AS DECIMAL(18,2)) AS DOUBLE) AS dist,
           CAST(pow(o_orderkey % 10, 2) AS BIGINT) AS sq,
           CAST(CAST(ln(o_totalprice) AS DECIMAL(12,6)) AS DOUBLE) AS log_price,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CAST(levenshtein(o_orderpriority, '1-URGENT') AS BIGINT) AS prio_dist,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
           translate(o_orderpriority, '-', '_') AS prio_snake,
           reverse(o_orderstatus) AS status_rev,
           CAST(length(trim(o_orderpriority)) AS BIGINT) AS prio_len
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar",),
    bench=True,
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared scalar surface in one projection (SURVEY §2.6):
    string (UPPER/SUBSTRING/CONCAT/LIKE/regexp_extract), date
    (date_trunc/datediff/add_months/ymd parts), math (mod/round/sqrt/abs/
    pow/ln), and null handling (nullif/coalesce).  Doubles never feed the
    hash raw: they pass through a DECIMAL rounding cast, then DOUBLE for
    the driver's canonicalizer (DECIMAL values with trailing zeros
    hash-differently per engine; the DECIMAL->DOUBLE cast is
    round-to-nearest in both)."""
    # r15 optimization round: the 23-expression projection (regexp,
    # levenshtein, date math) chained straight onto a one-split parquet
    # scan ran on a single core; ensure_parallelism spreads the per-row
    # compute and is a no-op on any production table with real splits.
    orders = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 100)).alias("prio_name"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        (F.col("o_totalprice").cast(DEC) % 100).cast("double").alias("price_mod"),
        F.round(F.col("o_totalprice").cast(DEC), 0).cast("double").alias("price_round"),
        F.sqrt("o_totalprice").cast("decimal(18,4)").cast("double").alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.col("o_orderpriority").like("%URGENT").alias("is_urgent"),
        F.regexp_extract("o_orderpriority", "[0-9]+", 0).alias("prio_num"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3m"),
        (
            F.year("o_orderdate") * 10000
            + F.month("o_orderdate") * 100
            + F.dayofmonth("o_orderdate")
        ).alias("ymd"),
        F.abs(F.col("o_totalprice") - 100000).cast(DEC).cast("double").alias("dist"),
        F.pow(F.col("o_orderkey") % 10, 2).cast("long").alias("sq"),
        F.log(F.col("o_totalprice")).cast("decimal(12,6)").cast("double").alias("log_price"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.levenshtein("o_orderpriority", F.lit("1-URGENT")).cast("long").alias("prio_dist"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.translate("o_orderpriority", "-", "_").alias("prio_snake"),
        F.reverse(F.col("o_orderstatus")).alias("status_rev"),
        F.length(F.trim(F.col("o_orderpriority"))).cast("long").alias("prio_len"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Q14 — explode / UNNEST (the transferList shape)
# ---------------------------------------------------------------------------
@query(
    "q14_explode_tokens",
    """
    SELECT lang, tok, COUNT(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY lang, tok
    HAVING COUNT(*) >= 20
    ORDER BY lang, tok
    """,
    tags=("explode", "aggregate"),
    bench=True,
    # parked in r14 (driver-green r13; slot ceded to the r9/r10-stale
    # rotation cohort): explode stays driver-checked via the incoming
    # hed_tx_explode_transfers (the reference's own REPEATED-record
    # shape) plus llm_chunking / llm_pair_stats' explode fan-outs.
    driver_visible=False,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode() over an array column — the load-bearing repeated-record
    access pattern (SURVEY §2.6: transferList.accountAmounts is queryable
    only via explode; transactions-schema.json:335-364)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 20)
        # vocabulary-bounded output (tokens seen >= 20 times), not
        # data-proportional (tables.bounded_sort)
        .transform(lambda d: bounded_sort(d, "lang", "tok"))
    )


# ---------------------------------------------------------------------------
# Q16 — tumbling window aggregate (ST6)
# ---------------------------------------------------------------------------
@query(
    "q16_window_tumbling",
    """
    SELECT 'tumble' AS kind,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'hop' AS kind,
           CAST(ws AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_value
    FROM (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             event_type, value
      FROM events
    )
    GROUP BY 2, 3
    ORDER BY kind, window_start, event_type
    """,
    tags=("window-agg", "streaming"),
    bench=True,
    # parked in r14 (driver-green r13; slot ceded to the r9/r10-stale
    # rotation cohort): ST6 time-window aggregation stays
    # driver-checked via the incoming q18_session_window; the tumbling
    # F.window expression also runs driver-checked under real
    # streaming in hed_stream_ingest's windowed stats.
    driver_visible=False,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + hopping event-time windows via F.window, tagged union —
    the identical expressions run under Structured Streaming with a
    watermark (see streaming/ingest.py); here they execute in batch mode
    for the oracle.  The hopping form (2-hour window sliding by 1 hour)
    fans each event into window/slide rows BEFORE the aggregate — the
    same map-side explode Spark's streaming planner emits; the oracle
    mirrors it with an explicit 2-element unnest."""
    events = load_table(spark, sf_dir, "events")

    def agg_windows(wspec, kind):
        return (
            events.groupBy(wspec.alias("w"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast(DEC))
                .cast("decimal(28,2)")
                .cast("double")
                .alias("total_value"),
            )
            .select(
                F.lit(kind).alias("kind"),
                F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "event_type",
                "n",
                "total_value",
            )
        )

    out = agg_windows(F.window("ts", "1 hour"), "tumble").unionByName(
        agg_windows(F.window("ts", "2 hours", "1 hour"), "hop")
    )
    # time-grid output: hours-in-span x event types x 3, not row count
    # (tables.bounded_sort)
    return out.transform(lambda d: bounded_sort(d, "kind", "window_start", "event_type"))
