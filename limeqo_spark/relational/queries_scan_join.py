"""Sources, sinks, projection, filter, joins — SURVEY §2B B1-B15 (Q01-Q15).

Design notes for 100 TB scale:
  - every query is a declarative DataFrame plan: filters/projections reach
    the parquet scan (PushedFilters / ReadSchema), joins pick broadcast for
    dimension tables explicitly, fact-fact joins stay sort-merge/shuffle-hash
    on the join key so AQE can coalesce + skew-split.
  - money sums go through DECIMAL so results are partition-order independent
    (double summation order varies across executors at scale).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import scratch_dir, table
from limeqo_spark.relational.registry import query

# --- helpers -----------------------------------------------------------------


def dec_sum(col: str | F.Column, scale: int = 2, alias: str | None = None) -> F.Column:
    """Exact, order-independent money sum: cast to DECIMAL, sum, emit DOUBLE.

    Summing doubles is not associative; at 1000-executor scale the partial
    aggregation order is nondeterministic, so a ROUND(SUM(double), 2) can
    flip. DECIMAL sums are exact and deterministic everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    # round IN DECIMAL, then cast: ROUND(double, n) diverges between
    # engines on .xx50 repr ties (review r8); decimal HALF_UP is
    # engine-identical (verified incl. negatives)
    out = F.round(F.sum(c.cast(f"decimal(18,{scale})")), scale).cast("double")
    return out.alias(alias) if alias else out


# --- B1/B5/B6: scans, projection, filters ------------------------------------


@query(
    "q01_parquet_scan_checksum",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS s,
           MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
    FROM lineitem
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 parquet scan: full-table checksum of lineitem."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        dec_sum("l_extendedprice", 2, "s"),
        F.min("l_orderkey").alias("mn"),
        F.max("l_orderkey").alias("mx"),
    )


@query(
    "q02_csv_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(r_regionkey) AS BIGINT) AS s,
           MIN(r_name) AS mn, MAX(r_name) AS mx
    FROM region
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 CSV source: re-export region to CSV with explicit schema, re-read, agg."""
    out = scratch_dir(prefix="limeqo_q02_")
    table(spark, sf_dir, "region").write.mode("overwrite").option("header", True).csv(out)
    df = spark.read.schema("r_regionkey int, r_name string").option("header", True).csv(out)
    return df.agg(
        F.count("*").alias("n"),
        F.sum("r_regionkey").cast("bigint").alias("s"),
        F.min("r_name").alias("mn"),
        F.max("r_name").alias("mx"),
    )


@query(
    "q03_json_props",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS ks
    FROM events WHERE props IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 JSON: parse events.props with from_json and aggregate the payload."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.filter(F.col("props").isNotNull()).withColumn(
        "k", F.from_json("props", "k bigint").getField("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").cast("bigint").alias("ks"))
        .orderBy("event_type")
    )


@query(
    "q04_parquet_sink_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS n
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 sink: write Q16's result to parquet, re-read — must hash-equal Q16."""
    from limeqo_spark.relational.queries_agg_window import q16

    out = scratch_dir(prefix="limeqo_q04_")
    q16(spark, sf_dir).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


#: charge in exact DECIMAL arithmetic. Engines disagree on ROUND(double, n)
#: at repr boundaries (Spark rounds the shortest decimal repr, DuckDB the
#: true binary value), so the money expression is computed in decimal where
#: multiplication is exact and HALF_UP rounding is well-defined in both.
CHARGE_SQL = (
    "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(6,2))"
    " * CAST(1 + l_tax AS DECIMAL(6,2)), 4) AS DOUBLE)"
)


@query(
    "q05_projection_charge",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, {CHARGE_SQL} AS charge
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 projection: arithmetic select; Catalyst prunes the scan to 5 columns.

    The decimal charge is projected AFTER the global sort (opt r11, guide
    §2.3 "project before the exchange" applied in reverse to compute): the
    sort keys are raw columns, so ordering the 5 pruned source columns
    first means the range-partitioning sampling pass and the map side of
    the one exchange never evaluate the decimal arithmetic — it runs once,
    post-shuffle, spread across the sort partitions. Same rows, same
    (unique-key) order, same charge expression; the shuffle carries the 3
    raw doubles instead of a computed decimal (same width)."""
    li = table(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
        * (1 + F.col("l_tax")).cast("decimal(6,2)")
    )
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
        )
        .orderBy("l_orderkey", "l_linenumber")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(charge, 4).cast("double").alias("charge"),
        )
    )


@query(
    "q06_compound_filter",
    oracle="""
    SELECT COUNT(*) AS n FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1994-01-01' AND DATE '1994-12-31'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag IN ('R','A')
      AND l_linestatus IS NOT NULL
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 filter: compound predicate (range, BETWEEN, IN, IS NOT NULL) + count."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").cast("date").between("1994-01-01", "1994-12-31")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("R", "A")
        & F.col("l_linestatus").isNotNull()
    ).agg(F.count("*").alias("n"))


# --- B7-B15: joins ------------------------------------------------------------


@query(
    "q07_broadcast_join",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS s
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 broadcast hash join: fact x small dim — dim is explicitly broadcast
    so the 100 TB fact side never shuffles."""
    li, part = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), dec_sum("l_extendedprice", 2, "s"))
        .orderBy("p_brand")
    )


_Q08_ORACLE = """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS q
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("q08_sortmerge_join", oracle=_Q08_ORACLE)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 sort-merge join: fact x fact on the natural key — MERGE hint."""
    li, orders = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    return (
        li.hint("MERGE")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dec_sum("l_quantity", 2, "q"))
        .orderBy("o_orderstatus")
    )


@query("q09_shufflehash_join", oracle=_Q08_ORACLE)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 shuffle-hash join: same logical query as Q08 under SHUFFLE_HASH —
    hint-invariance: must hash-equal Q08."""
    li, orders = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    return (
        li.join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dec_sum("l_quantity", 2, "q"))
        .orderBy("o_orderstatus")
    )


@query(
    "q10_cross_join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    WHERE n_regionkey = r_regionkey ORDER BY r_name, n_name
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 nested-loop/cartesian: tiny cross join + post-filter."""
    r, n = table(spark, sf_dir, "region"), table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "q11_nonequi_join",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 theta join: equi key + non-equi conjunct (ships after order date).

    The equi conjunct keeps this a hash/sort-merge join (shuffled on the
    key), NOT a nested-loop — the range predicate is evaluated post-match.
    """
    o, li = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    return (
        o.join(li, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderkey")
    )


_Q12_COLS = """c_mktsegment, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows"""


@query(
    "q12_left_join",
    oracle=f"""
    SELECT {_Q12_COLS} FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 left outer join with NULL-aware counts."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"), F.count("*").alias("n_rows"))
        .orderBy("c_mktsegment")
    )


@query(
    "q12b_right_join",
    oracle=f"""
    SELECT {_Q12_COLS} FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q12b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 right outer join (mirror of q12 — same result, other side preserved)."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"), F.count("*").alias("n_rows"))
        .orderBy("c_mktsegment")
    )


@query(
    "q12c_full_join",
    oracle="""
    SELECT COALESCE(c_mktsegment, '<none>') AS seg,
           COUNT(o_orderkey) AS n_orders, COUNT(c_custkey) AS n_cust, COUNT(*) AS n_rows
    FROM orders FULL JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q12c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 full outer join: both-side NULL groups surfaced."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "full")
        .groupBy(F.coalesce("c_mktsegment", F.lit("<none>")).alias("seg"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count("c_custkey").alias("n_cust"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("seg")
    )


@query(
    "q13_semi_anti_join",
    oracle="""
    SELECT 'semi' AS kind, COUNT(*) AS n FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    UNION ALL
    SELECT 'anti' AS kind, COUNT(*) AS n FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 semi/anti join (EXISTS / NOT EXISTS decorrelation)."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000)
    semi = c.join(big, big.o_custkey == c.c_custkey, "left_semi").agg(F.count("*").alias("n"))
    anti = c.join(big, big.o_custkey == c.c_custkey, "left_anti").agg(F.count("*").alias("n"))
    return semi.select(F.lit("semi").alias("kind"), "n").unionByName(
        anti.select(F.lit("anti").alias("kind"), "n")
    )


@query(
    "q14_asof_join",
    oracle="""
    SELECT o.o_orderkey,
           (SELECT e.event_id FROM events e
             WHERE e.user_id % 100 = o.o_custkey % 100 AND e.ts <= o.o_orderdate
             ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS event_id
    FROM orders o ORDER BY o.o_orderkey
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 as-of join (latest event at-or-before each order, per cohort).

    Scale-first implementation: instead of the naive M x N time-range join
    (which explodes before the window filter), union the two streams tagged
    by side and take a running ``last(event_id)`` ordered by time within the
    cohort — one shuffle, no blow-up, same semantics as merge_asof.
    Orders sort after events at equal ts (is_order=1) so ties honor <=.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events")
    ev = e.select(
        (F.col("user_id") % 100).alias("cohort"),
        F.col("ts"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
    )
    od = o.select(
        (F.col("o_custkey") % 100).alias("cohort"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("o_orderkey"),
    )
    merged = ev.unionByName(od)
    w = (
        W.partitionBy("cohort")
        .orderBy("ts", "is_order", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        merged.withColumn("asof_event", F.last("event_id", ignorenulls=True).over(w))
        .filter(F.col("is_order") == 1)
        .select("o_orderkey", F.col("asof_event").alias("event_id"))
        .orderBy("o_orderkey")
    )


@query(
    "q15_star_join",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY n_name
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 multi-way star join (JOB-style): one fact-fact sort-merge join on
    the order key; all dimensions broadcast so they add no shuffles. The
    region filter is pushed through the broadcast chain by Catalyst."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
        .orderBy("n_name")
    )


@query(
    "skew_salted_join",
    oracle="""
    WITH dim AS (SELECT DISTINCT event_type, UPPER(event_type) AS label FROM events)
    SELECT d.label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.label ORDER BY d.label
    """,
)
def skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated hot-key join (scale path beyond AQE's skew split):
    events.event_type has only a handful of values, so an unsalted shuffle
    join would send each entire key to one task. skew.salted_join scatters
    the fact side over 8 sub-keys and replicates the dim 8x; the oracle is
    the PLAIN join — salting must be invisible in the result."""
    from limeqo_spark.skew import salted_join

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .select(F.col("event_type").alias("d_type"), F.upper("event_type").alias("label"))
    )
    joined = salted_join(ev, dim, ev.event_type == dim.d_type, factor=8)
    return (
        joined.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("total_value"),
        )
        .orderBy("label")
    )


@query(
    "q46_partition_pruned_scan",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = (SELECT CAST(MIN(ts) AS DATE) FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 at scale made explicit: write events PARTITIONED BY event_date,
    read back filtering one date — the filter must become a partition
    filter (directory pruning; at 100 TB this is the difference between
    scanning one day and scanning the lake). The oracle computes the same
    day's aggregate from the unpartitioned table; a plan-quality test
    asserts the pruned scan reads a single partition."""
    df = partitioned_events(spark, sf_dir)
    first_day = (
        table(spark, sf_dir, "events").agg(F.min(F.col("ts").cast("date"))).collect()[0][0]
    )
    return (
        df.filter(F.col("event_date") == F.lit(str(first_day)))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


_PARTITIONED_CACHE: dict[str, str] = {}


def partitioned_events(spark: SparkSession, sf_dir: str):
    """events re-written partitioned by event_date (hive-style directories);
    memoized per sf_dir — the layout a 100 TB event lake would use."""
    out = _PARTITIONED_CACHE.get(sf_dir)
    if out is None or not __import__("os").path.isdir(out):
        out = scratch_dir(prefix="limeqo_part_events_")
        ev = table(spark, sf_dir, "events").withColumn(
            "event_date", F.col("ts").cast("date").cast("string")
        )
        ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
        _PARTITIONED_CACHE[sf_dir] = out
    return spark.read.parquet(out)


#: the DECIMAL revenue sum (no double cast here: consumers round IN
#: DECIMAL first — ROUND(double, 2) diverges between engines on .xx50
#: repr ties, review r8 — then cast the 2dp-exact result to double)
REVENUE_SQL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(6,2)))"
)


@query(
    "q47_tpch_q3_shipping",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND({REVENUE_SQL}, 2) AS DOUBLE) AS revenue,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter broadcast
    into a fact-fact join, revenue in exact DECIMAL, deterministic top-10."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < "1995-03-15"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > "1995-03-15"
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q48_tpch_q5_local_volume",
    oracle=f"""
    SELECT n_name, CAST(ROUND({REVENUE_SQL}, 2) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 6-table join with the
    customer-nation = supplier-nation local condition; dims broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .orderBy("n_name")
    )


@query(
    "q49_tpch_q10_returns",
    oracle=f"""
    SELECT c_custkey, CAST(ROUND({REVENUE_SQL}, 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item customers): returns-filtered fact
    joined up to customers, deterministic top-20 by lost revenue."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(F.round(rev, 2).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q51_bucketed_colocated_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Colocated fact-fact join over ingest-time bucketed tables (SURVEY
    §4.4): lineitem and orders are materialized hash-bucketed by orderkey,
    so the join plans as a bucket-local SortMergeJoin with NO Exchange on
    either input — at 100 TB the fact table is shuffled once at ingest,
    never per query. Oracle is the plain join; a plan test asserts the
    exchange count."""
    from limeqo_spark.bucketing import ensure_bucketed_pair

    li_name, o_name = ensure_bucketed_pair(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q59_tpch_q4_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table predicate.
    Written as SQL so Catalyst's subquery decorrelation turns it into a
    left-semi join (the node DSB's plans exercise) — no manual rewrite."""
    from limeqo_spark.io import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "q60_tpch_q18_in_subquery",
    oracle="""
    SELECT o_orderkey, ROUND(CAST(qty AS DOUBLE), 2) AS qty FROM (
      SELECT l_orderkey AS o_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
    ) t ORDER BY qty DESC, o_orderkey LIMIT 50
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 core (large-volume orders): aggregate-in-subquery with a
    HAVING threshold feeding a deterministic top-N — the IN-over-grouped
    pattern Catalyst plans as agg -> filter -> TakeOrdered."""
    from limeqo_spark.io import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(CAST(qty AS DOUBLE), 2) AS qty FROM (
          SELECT l_orderkey AS o_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
        ) t ORDER BY qty DESC, o_orderkey LIMIT 50
        """
    )


@query(
    "q61_tpch_q17_scalar_subquery",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
           AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_size < 10
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated SCALAR subquery (per-part average) under
    the outer predicate. Catalyst decorrelates it into an aggregate joined
    back on p_partkey — one pass over lineitem per side, no per-row
    re-execution."""
    from limeqo_spark.io import register_views

    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
               AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_size < 10
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q62_binned_range_join",
    oracle="""
    SELECT a.event_type AS ta, b.event_type AS tb, CAST(COUNT(*) AS BIGINT) AS n
    FROM events a JOIN events b
      ON epoch_ns(b.ts) // 1000 > epoch_ns(a.ts) // 1000
     AND epoch_ns(b.ts) // 1000 <= epoch_ns(a.ts) // 1000 + 300000000
    GROUP BY ta, tb ORDER BY ta, tb
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure time-range join (no equality key) via limeqo_spark.rangejoin:
    binning turns the would-be BroadcastNestedLoopJoin into an equi-join on
    the bin number (plan-gated). Counts event-type pairs within 5 minutes;
    oracle is DuckDB's IEJoin over the same microsecond-precision bound."""
    from limeqo_spark.rangejoin import binned_range_join

    ev = table(spark, sf_dir, "events")
    a = ev.select(F.col("event_type").alias("ta"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_type").alias("tb"), F.col("ts").alias("ts_b"))
    pairs = binned_range_join(a, b, F.col("ts_a"), F.col("ts_b"), 300.0)
    return (
        pairs.groupBy("ta", "tb")
        .agg(F.count("*").alias("n"))
        .orderBy("ta", "tb")
    )


@query(
    "q65_iejoin_band",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(ROUND((vb - va) * 1e6) AS BIGINT)) AS BIGINT) AS gap_micro_sum,
           MIN(ea) AS min_ea, MAX(eb) AS max_eb
    FROM (SELECT event_id AS ea, "value" AS va FROM events WHERE event_type = 'click') a
    JOIN (SELECT event_id AS eb, "value" AS vb FROM events WHERE event_type = 'purchase') b
      ON va < vb AND vb <= va + 0.5
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General inequality join (no equality key, no fixed time grid) via
    limeqo_spark.rangejoin.ie_join: click/purchase value band ``va < vb <=
    va + 0.5``. Block-partitioned on the first attribute with per-block
    min/max pruning on the second — the distributed IEJoin strategy
    (Khayyat et al. VLDB'15), vs the BroadcastNestedLoopJoin Spark would
    otherwise plan. DuckDB's oracle runs its native IEJoin operator on the
    same predicate."""
    from limeqo_spark.rangejoin import ie_join

    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("ea"),
        F.col("value").alias("va"),
        (F.col("value") + F.lit(0.5)).alias("va_hi"),
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("eb"), F.col("value").alias("vb")
    )
    pairs = ie_join(a, b, ("va", "<", "vb"), ("va_hi", ">=", "vb"), blocks=16)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.round((F.col("vb") - F.col("va")) * 1e6).cast("bigint")).alias("gap_micro_sum"),
        F.min("ea").alias("min_ea"),
        F.max("eb").alias("max_eb"),
    )


@query(
    "q67_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(ROUND({REVENUE_SQL}, 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
         OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the fact joins
    up to BOTH a supplier nation and a customer nation — the same dimension
    table twice under different aliases — with a symmetric disjunctive
    nation-pair filter and a per-year rollup. The two nation sides
    broadcast; the disjunction stays above the joins (it references both
    sides) and Catalyst still prunes each broadcast to the two names."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
    )
    pair = (
        (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY")
    ) | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q68_tpch_q12_priority_classes",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority classes per ship channel; the fixture has
    no l_shipmode, so l_linestatus plays the channel): fact-fact join with
    a cross-table predicate and conditional-count aggregation — the CASE
    sums fold into one partial-aggregable pass, no per-class scans."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q69_tpch_q19_bracketed_disjunction",
    oracle=f"""
    SELECT CAST(ROUND({REVENUE_SQL}, 2) AS DOUBLE) AS revenue, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (bracketed disjunction): three OR-ed conjunction
    brackets mixing build-side (brand/size) and probe-side (quantity)
    predicates — the classic optimizer test. Catalyst factors the common
    join key and pushes the per-side residues: the part scan gets an
    Or(brand/size) pushed filter and lineitem gets the quantity envelope,
    so neither side scans unfiltered."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    b = lambda brand, s_lo, s_hi, q_lo, q_hi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b("Brand#1", 1, 15, 1, 15) | b("Brand#2", 10, 30, 10, 25) | b("Brand#3", 20, 50, 20, 35))
        .agg(F.round(rev, 2).cast("double").alias("revenue"), F.count("*").cast("bigint").alias("n"))
    )


@query(
    "q84_orc_sink_roundtrip",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink: write the filtered orders slice to ORC (Spark's
    second native columnar format — same predicate-pushdown/column-pruning
    machinery as parquet), re-read it, and aggregate. The oracle computes
    the identical aggregate from the original table, so the roundtrip must
    preserve every value bit-exactly. The aggregation happens on the
    RE-READ side, proving scan-side correctness rather than sink-side
    echo. Avro is not bundled in this build (external module since Spark
    2.4), so ORC is the second-format coverage."""
    out = scratch_dir(prefix="limeqo_q84_")
    (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .write.mode("overwrite")
        .orc(out)
    )
    return (
        spark.read.orc(out)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q85_schema_evolution_merge",
    oracle="""
    SELECT COALESCE(CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END,
                    '<pre-evolution>') AS prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM orders WHERE o_orderstatus IN ('O', 'F')
    GROUP BY prio ORDER BY prio
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on ingest: batch 1 lands with the original schema
    (orderkey, totalprice); batch 2 arrives after a producer added
    o_orderpriority. Reading the directory with mergeSchema=true must
    surface the union schema with NULLs for pre-evolution rows — the
    standard additive-column migration every long-lived ingest directory
    goes through. The aggregate runs on the merged read; the oracle
    recomputes it from the source table with the evolution boundary
    expressed as a CASE."""
    o = table(spark, sf_dir, "orders")
    out = scratch_dir(prefix="limeqo_q85_")
    (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(f"{out}/batch=1")
    )
    (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(f"{out}/batch=2")
    )
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(out)
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("prio")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).cast("double")
            .alias("total"),
        )
        .orderBy("prio")
    )


@query(
    "q88_xml_source",
    oracle="""
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           md5(string_agg(n_name, ',' ORDER BY n_name)) AS names_md5
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source (built-in since Spark 4): write ``nation`` as XML rows,
    read it back with ``format('xml')`` + rowTag, and aggregate — the
    digest of per-region name lists proves field-level fidelity through
    the serialize/parse round-trip against DuckDB reading the parquet
    original."""
    out = scratch_dir(prefix="limeqo_q88_")
    (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite")
        .option("rowTag", "nation")
        .format("xml")
        .save(out)
    )
    back = spark.read.format("xml").option("rowTag", "nation").load(out)
    names = F.expr("concat_ws(',', array_sort(collect_list(n_name)))")
    return (
        back.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.md5(names).alias("names_md5"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "q89_text_source_lines",
    oracle="""
    SELECT md5(text) AS line_md5 FROM documents ORDER BY line_md5
    """,
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source: write every document as one line of a
    ``spark.write.text`` file, read back with ``spark.read.text`` (one row
    per line), digest each line. Order is not a text-source guarantee, so
    the contract sorts by digest — content fidelity, not order, is the
    claim (fixture docs contain no newlines; a real corpus would
    escape or length-prefix)."""
    out = scratch_dir(prefix="limeqo_q89_")
    table(spark, sf_dir, "documents").select("text").write.mode("overwrite").text(out)
    return (
        spark.read.text(out)
        .select(F.md5("value").alias("line_md5"))
        .orderBy("line_md5")
    )


@query(
    "q109_jsonl_corrupt_records",
    oracle="""
    WITH valid AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
             CAST(SUM(n_chars) AS BIGINT) AS sum_nc
      FROM documents WHERE doc_id % 7 <> 3 GROUP BY lang
    ),
    corrupt AS (
      SELECT '__corrupt__' AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
             CAST(0 AS BIGINT) AS sum_nc
      FROM documents WHERE doc_id % 7 = 3
    )
    SELECT * FROM valid UNION ALL SELECT * FROM corrupt ORDER BY lang
    """,
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record JSONL ingestion — the robustness surface every
    100 TB web-scale ingest needs: a staged JSONL file with PLANTED
    malformed lines (every doc_id % 7 = 3 row is written as truncated,
    unclosed JSON carrying its id) is read back in PERMISSIVE mode with
    ``columnNameOfCorruptRecord``; malformed lines must land whole in the
    corrupt column (never silently dropped, never partially parsed into
    the data columns) and valid lines must parse exactly. The audit
    output proves IDENTITY, not just counts: valid rows aggregate their
    recovered (doc_id, n_chars) per language, and the corrupt bucket
    re-extracts each quarantined line's doc_id from the raw corrupt text
    — the oracle recomputes both directly from the fixture table. At
    scale this is one pass: the permissive read IS the quarantine
    (corrupt rows route to a dead-letter sink; no second scan)."""
    d = table(spark, sf_dir, "documents")
    lines = d.select(
        F.when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "broken"')),
        )
        .otherwise(F.to_json(F.struct("doc_id", "lang", "n_chars")))
        .alias("value")
    )
    out = scratch_dir(prefix="limeqo_q109_")
    lines.write.mode("overwrite").text(out)
    parsed = (
        spark.read.schema("doc_id long, lang string, n_chars long, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
        # Spark disallows queries whose referenced columns are ONLY the
        # internal corrupt-record column on a raw JSON scan
        # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
        # documented remedy is to materialize the parse once; eager
        # localCheckpoint also means the quarantine split below reads one
        # parse, not two scans (blocks auto-clean when unreferenced)
        .localCheckpoint(eager=True)
    )
    valid = (
        parsed.filter(F.col("_corrupt").isNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_nc"),
        )
    )
    corrupt = (
        parsed.filter(F.col("_corrupt").isNotNull())
        .select(
            F.regexp_extract("_corrupt", r'\{"doc_id": (\d+),', 1)
            .cast("bigint")
            .alias("cid")
        )
        .agg(
            F.lit("__corrupt__").alias("lang"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cid").alias("sum_doc_id"),
            F.lit(0).cast("bigint").alias("sum_nc"),
        )
    )
    return valid.unionByName(corrupt).orderBy("lang")


@query(
    "q91_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                               THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2
                               ELSE CAST(o_totalprice AS DECIMAL(18,2)) END),
                 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lake in-place partition rewrite:
    seed a table partitioned by ``o_orderpriority``, then overwrite ONLY
    the 1-URGENT partition with doubled prices under
    ``partitionOverwriteMode=dynamic``. The final rollup proves the
    semantics: had the second write run in static mode it would have
    DROPPED every other partition and the other priorities' rows would
    vanish from the oracle comparison.

    Scale (100 TB): this is the idiomatic backfill/correction pattern —
    rewrite one day/priority partition in place without touching (or even
    listing) the others; pairs with q46's partition-pruned reads."""
    out = scratch_dir(prefix="limeqo_q91_")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast(
            o.schema["o_totalprice"].dataType.simpleString()
        ),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        urgent.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q94_null_safe_join",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_orderkey < 4000
    ),
    r AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_orderkey < 4000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(CASE WHEN l.k IS NULL THEN 1 END) AS BIGINT) AS null_pairs
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM — the predicate
    Catalyst emits when decorrelating NOT IN subqueries): NULL keys match
    EACH OTHER instead of vanishing, so the null×null block contributes
    pairs a plain equi-join would silently drop. Planted NULLs on both
    sides make that block non-empty; the pair counts verify both the
    matching rule and that ``<=>`` still drives a HASH join (not BNLJ)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_custkey")).alias("k"),
    )
    right = o.select(
        F.col("o_orderkey").alias("rk_id"),
        F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_custkey")).alias("rk"),
    )
    joined = left.join(right, F.col("k").eqNullSafe(F.col("rk")))
    return joined.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.count(F.when(F.col("k").isNull(), 1)).cast("bigint").alias("null_pairs"),
    )
