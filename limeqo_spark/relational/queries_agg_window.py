"""Aggregation, set-ops, window, sampling — SURVEY §2B B16-B27, B34-B36.

All aggregates are partial+final (map-side combine) automatically; the
explicit DECIMAL casts make sums order-independent so partial aggregation
over any partitioning is safe (see queries_scan_join.dec_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.queries_scan_join import dec_sum
from limeqo_spark.relational.registry import query, raise_on_failed_gates


@query(
    "q16_tpch_q1_agg",
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
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 hash aggregate, TPC-H Q1 shape (partial+final HashAggregate)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", 2, "sum_qty"),
            dec_sum("l_extendedprice", 2, "sum_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("*"),
                4,
            ).alias("avg_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q17_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS u, COUNT(DISTINCT o_orderpriority) AS p
    FROM orders
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 exact distinct counts (expands to two-phase distinct aggregation)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("u"),
        F.countDistinct("o_orderpriority").alias("p"),
    )


#: q18 HLL acceptance (relative error; rsd=0.02 measures well inside it).
#: Module-level so the negative test can plant an impossible bound.
_Q18_TOL = 0.05


@query("q18_approx_count_distinct", oracle=None, check="prop")
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 HLL approx distinct — PROP: within 5% of exact; a violation
    RAISES (GateFailure -> driver-visible err, VERDICT r9 #3 extended).

    Returns (approx, exact, ok) so the rows-only gate still exercises it.
    """
    o = table(spark, sf_dir, "orders")
    df = o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    return raise_on_failed_gates(
        df.select(
            "approx",
            "exact",
            (F.abs(F.col("approx") - F.col("exact")) <= _Q18_TOL * F.col("exact")).alias("ok"),
        ),
        "q18_approx_count_distinct",
    )


@query(
    "q19_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, n
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 rollup (grouping sets): per-(region,nation), per-region, grand total."""
    n, r = table(spark, sf_dir, "nation"), table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first(), "n")
    )


#: q20's two-phase bar: partial+final => >= this many HashAggregate nodes.
#: Module-level so the negative test can plant an impossible bound.
_Q20_MIN_AGGS = 2


@query("q20_partial_agg_plan", oracle=None, check="prop")
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 plan-shape assertion: Q16's physical plan does partial+final
    HashAggregate with an Exchange between (map-side combine at scale);
    a shape regression RAISES (GateFailure -> driver-visible err)."""
    df = q16(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_agg = "HashAggregate" in plan
    has_exchange = "Exchange" in plan
    # partial + final => the aggregate operator appears (at least) twice
    two_phase = plan.count("HashAggregate") >= _Q20_MIN_AGGS
    return raise_on_failed_gates(
        spark.createDataFrame(
            [(has_agg, has_exchange, two_phase, has_agg and has_exchange and two_phase)],
            "has_agg boolean, has_exchange boolean, two_phase boolean, ok boolean",
        ),
        "q20_partial_agg_plan",
    )


@query(
    "q21_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    ORDER BY l_shipdate, l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21/B22 total-order sort + limit (TakeOrderedAndProject: per-partition
    top-K then merge — never a full global sort)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_shipdate"),
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .select("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q22_topk_by_spend",
    oracle="""
    SELECT c_custkey, cnt, spend FROM (
      SELECT o_custkey AS c_custkey, COUNT(*) AS cnt,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ) t ORDER BY spend DESC, c_custkey LIMIT 10
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 top-K after aggregation, deterministically tie-broken by key."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("cnt"), dec_sum("o_totalprice", 2, "spend"))
        .orderBy(F.col("spend").desc(), F.col("c_custkey"))
        .limit(10)
    )


@query(
    "q23_ranking_windows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS BIGINT) AS rk
    FROM orders
    QUALIFY rn <= 3
    ORDER BY o_custkey, o_orderkey
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 ranking windows: row_number (unique order) + rank (decimal ties)."""
    o = table(spark, sf_dir, "orders")
    w_rn = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_rk = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").cast("decimal(18,2)").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_rn).cast("bigint").alias("rn"),
            F.rank().over(w_rk).cast("bigint").alias("rk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q24_lag_window",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events ORDER BY user_id, event_id
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 analytic window: lag over a per-user time order."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select("user_id", "event_id", F.lag("event_id").over(w).alias("prev")).orderBy(
        "user_id", "event_id"
    )


@query(
    "q25_running_sum",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(ROUND(value, 4)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run
    FROM events ORDER BY user_id, event_id
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25 aggregate window with an explicit ROWS frame (running sum)."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.round("value", 4)).over(w), 4).alias("run"),
    ).orderBy("user_id", "event_id")


@query(
    "q26_union",
    oracle="""
    SELECT 'union_all' AS kind, COUNT(*) AS n FROM (
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linestatus = 'F'
    ) t
    UNION ALL
    SELECT 'union_distinct' AS kind, COUNT(*) AS n FROM (
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
      UNION
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linestatus = 'F'
    ) t
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 union all vs union distinct over overlapping slices."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_linenumber")
    b = li.filter(F.col("l_linestatus") == "F").select("l_orderkey", "l_linenumber")
    ua = a.unionByName(b).agg(F.count("*").alias("n")).select(
        F.lit("union_all").alias("kind"), "n"
    )
    ud = a.unionByName(b).distinct().agg(F.count("*").alias("n")).select(
        F.lit("union_distinct").alias("kind"), "n"
    )
    return ua.unionByName(ud)


@query(
    "q27_intersect_except",
    oracle="""
    SELECT 'intersect' AS kind, c_nationkey AS k FROM
      (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t
    UNION ALL
    SELECT 'except' AS kind, c_nationkey AS k FROM
      (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier) t
    ORDER BY kind, k
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 intersect / except (distinct set semantics)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    i = c.intersect(s).select(F.lit("intersect").alias("kind"), F.col("c_nationkey").alias("k"))
    e = c.subtract(s).select(F.lit("except").alias("kind"), F.col("c_nationkey").alias("k"))
    return i.unionByName(e).orderBy("kind", "k")


@query(
    "q34_conditional_null",
    oracle="""
    SELECT o_orderstatus,
           COALESCE(NULLIF(o_orderpriority, ''), 'NONE') AS prio,
           CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34 conditional/null battery: CASE WHEN, COALESCE, NULLIF."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_orderstatus",
            F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("")), F.lit("NONE")).alias(
                "prio"
            ),
        )
        .agg(
            F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
            .cast("bigint")
            .alias("big_orders"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus", "prio")
    )


@query(
    "q35_percentiles",
    oracle="""
    SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd,
           ROUND(corr(l_extendedprice, l_quantity), 4) AS c
    FROM lineitem
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35 exact percentiles + stddev + corr (Spark percentile ==
    interpolated quantile_cont)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("c"),
    )


#: (seed1, seed2) for the q36 self-consistency rehearsal — equal by
#: contract; the negative test plants a mismatch to prove the gate raises
_Q36_SEEDS = (42, 42)


@query("q36_seeded_sample", oracle=None, check="prop")
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36 seeded sampling self-consistency: same (fraction, seed) twice ->
    identical sample. Returns (n1, n2, consistent); a violation RAISES
    (GateFailure -> driver-visible err, VERDICT r9 #3 — previously the
    bound was a silent ok column whose flip only prop_gates could see)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    s1 = li.sample(fraction=0.1, seed=_Q36_SEEDS[0])
    s2 = li.sample(fraction=0.1, seed=_Q36_SEEDS[1])
    n1, n2 = s1.count(), s2.count()
    diff = s1.exceptAll(s2).count() + s2.exceptAll(s1).count()
    return raise_on_failed_gates(
        spark.createDataFrame(
            [(n1, n2, diff == 0)], "n1 bigint, n2 bigint, consistent boolean"
        ),
        "q36_seeded_sample",
        ok_col="consistent",
    )


@query(
    "q56_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f_cnt,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o_cnt,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p_cnt,
           ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS f_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide conditional aggregation): order counts and F-status
    price per priority, statuses as columns. Values are pinned explicitly —
    at 100 TB an unpinned pivot pays a full distinct-values pass before the
    real aggregation; a pinned one is a single pass."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("price"),
        )
    )
    return (
        piv.select(
            "o_orderpriority",
            F.coalesce("F_cnt", F.lit(0)).alias("f_cnt"),
            F.coalesce("O_cnt", F.lit(0)).alias("o_cnt"),
            F.coalesce("P_cnt", F.lit(0)).alias("p_cnt"),
            F.round(F.coalesce(F.col("F_price").cast("double"), F.lit(0.0)), 2).alias("f_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q57_cube_grouping",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE(r_name, n_name) ORDER BY gid, region, nation
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 completed: CUBE over (region, nation) with grouping_id — all four
    grouping sets in one pass (partial aggregation handles the expansion;
    no four-scan union)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.cube("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2).cast("double").alias("bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "gid",
            "n_cust",
            "bal",
        )
        .orderBy("gid", "region", "nation")
    )


@query(
    "q58_string_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: collect_list is shuffle-order-
    dependent, so the list is sorted before joining — the only way a
    string_agg hash-matches across engines (and across AQE layouts)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("r_name")
    )


@query(
    "q83_time_range_window",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('purchase', 'click')
    )
    SELECT user_id, event_id,
           CAST(SUM(cents) OVER (
             PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cents_1h,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_1h
    FROM ev ORDER BY user_id, event_id
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame — the point-in-time-correct feature shape
    for training pipelines: for every event, aggregate the same user's
    trailing hour (RANGE over epoch seconds, not ROWS — simultaneous
    events all enter each other's frame, which a row frame would split
    nondeterministically). Money stays exact as integer cents. One window
    shuffle keyed by the high-cardinality user_id; at 100 TB this is the
    standard feature-backfill plan (and the streaming analog is q44b's
    sliding window)."""
    from limeqo_spark.io import epoch_us

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "event_id",
            (epoch_us("ts") / F.lit(1_000_000)).cast("bigint").alias("ts_s"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.sum("cents").over(w).cast("bigint").alias("cents_1h"),
        F.count("*").over(w).cast("bigint").alias("n_1h"),
    ).orderBy("user_id", "event_id")


@query(
    "q92_unpivot_melt",
    oracle="""
    WITH melted AS (
      SELECT 'l_quantity' AS metric, CAST(l_quantity AS DECIMAL(18,2)) AS val
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(val), 2) AS DOUBLE) AS total
    FROM melted GROUP BY metric ORDER BY metric
    """,
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt — the wide-to-long reshape at the heart of the
    reference's matrix ingestion (SURVEY A1: 49 hint columns ->
    (hint_id, latency) long form via stack). ``DataFrame.unpivot``
    compiles to a single Expand node: one scan, rows x4, no join — the
    shape the oracle's UNION-ALL form would need four scans for."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    melted = li.select(
        *[F.col(c).cast("decimal(18,2)").alias(c) for c in cols]
    ).unpivot([], cols, "metric", "val")
    return (
        melted.groupBy("metric")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("val"), 2).cast("double").alias("total"),
        )
        .orderBy("metric")
    )


@query(
    "q93_forward_fill",
    oracle="""
    WITH gapped AS (
      SELECT user_id, event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    filled AS (
      SELECT user_id, event_id, v,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS v_filled
      FROM gapped
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (v IS NULL) AS BIGINT) AS n_gaps,
           CAST(COUNT(*) FILTER (v IS NULL AND v_filled IS NOT NULL) AS BIGINT)
             AS n_filled,
           CAST(SUM(CAST(FLOOR(v_filled * 100) AS BIGINT)) AS BIGINT) AS filled_sum_e2
    FROM filled GROUP BY user_id ORDER BY user_id
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF) — the gap-filling pass of time-series feature
    engineering: plant deterministic gaps (every 7th event), then carry
    the last non-null observation forward per user with
    ``last(..., ignorenulls=True)`` over an ordered running frame
    (== ``LAST_VALUE(x IGNORE NULLS)``). A leading gap stays NULL —
    counted, not invented. The checksum floors each filled value to int
    cents BEFORE summing: a double SUM's addition order varies with input
    splits (found for real at sf0.1 — the groupBy partial aggregates drift
    the last bit and flip the floor), while per-row floor + bigint sum is
    exact and order-independent at any scale."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = ev.withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("v").isNull(), 1)).cast("bigint").alias("n_gaps"),
            F.count(F.when(F.col("v").isNull() & F.col("v_filled").isNotNull(), 1))
            .cast("bigint")
            .alias("n_filled"),
            F.sum(F.floor(F.col("v_filled") * 100).cast("bigint"))
            .cast("bigint")
            .alias("filled_sum_e2"),
        )
        .orderBy("user_id")
    )
