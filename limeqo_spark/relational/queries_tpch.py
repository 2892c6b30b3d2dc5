"""TPC-H shape battery, part 2: the 12 query shapes (Q2, Q6, Q8, Q9, Q11,
Q13, Q14, Q15, Q16, Q20, Q21, Q22) not already covered by q16/q47-q49/
q59-q61/q67-q69 — completing all 22 TPC-H shapes over the fixture schema.

The fixture (TESTDATA.md) has no ``partsupp`` table and trims several
columns (no l_shipmode/l_commitdate/l_receiptdate, no c_phone, no
ps_supplycost), so each query keeps the *shape* that makes the original
interesting — the correlated scalar subquery of Q2/Q11/Q20, the double
EXISTS/NOT-EXISTS of Q21, the anti-join + relation-wide scalar threshold of
Q22, the two-level aggregation of Q13 — re-anchored on columns that exist:

- supplier-part relationships come from ``SELECT DISTINCT l_partkey,
  l_suppkey FROM lineitem`` (the fixture's only part-supplier link),
- "complaints" (Q16/Q21 exclusion filters) become negative account
  balances / low order priorities,
- country codes (Q22) come from the trailing digits of ``c_name``.

Determinism rules follow registry.py: money sums go through DECIMAL so the
aggregate is exact in both engines; ratios divide the exact decimal sums as
doubles and ROUND(x, 4); fractional thresholds are cross-multiplied
(``value * 1000 > total``) so no engine ever divides; output ordering always
ends in a unique key.

Scale notes (100 TB): every dimension side (part 2k, supplier 100, nation,
region, per-part maxima, per-order lateness profiles) is broadcast; the only
shuffles are lineitem aggregations keyed by high-cardinality keys
(partkey/suppkey/orderkey), all partial-aggregable map-side. No windows over
unbounded partitions, no cross joins, no correlated per-row subplans — the
correlated subqueries are decorrelated by hand into aggregate+join exactly
as Catalyst rewrites them (reference parity for the decorrelation family:
q59-q61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query

#: exact decimal revenue sum (matches queries_scan_join.REVENUE_SQL):
#: no double cast here — consumers round IN DECIMAL first (review r8)
REVENUE_SQL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(6,2)))"
)


def _rev() -> F.Column:
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(6,2)")
    )


def _qty() -> F.Column:
    return F.col("l_quantity").cast("decimal(12,2)")


@query(
    "q70_tpch_q2_min_cost_supplier",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey
    FROM part JOIN pairs ON p_partkey = pairs.l_partkey
              JOIN euro ON euro.s_suppkey = pairs.l_suppkey
    WHERE p_size = 15 AND p_type = 'LARGE'
      AND s_acctbal = (
        SELECT MAX(e2.s_acctbal)
        FROM pairs p2 JOIN euro e2 ON e2.s_suppkey = p2.l_suppkey
        WHERE p2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): correlated scalar subquery —
    per-part best supplier within a region — decorrelated into a per-part
    MAX aggregate joined back on (partkey, acctbal). The fixture has no
    partsupp, so supplier-part relationships are the distinct
    (l_partkey, l_suppkey) pairs of lineitem (reference Q2 semantics:
    ps_supplycost MIN becomes s_acctbal MAX). Supplier x nation x region
    (100 rows) broadcasts; the pairs aggregation is the only shuffle and
    it is partial-aggregable on l_partkey."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")

    euro = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    euro_pairs = pairs.join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
    best = euro_pairs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    parts = p.filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE")).select("p_partkey")
    return (
        euro_pairs.join(F.broadcast(best),
                        (F.col("l_partkey") == F.col("b_partkey"))
                        & (F.col("s_acctbal") == F.col("best_bal")))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.round("s_acctbal", 2).alias("s_acctbal"), "s_name", "n_name", "p_partkey")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q71_tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the pure scan-filter-aggregate —
    no join, no group. All three predicates push to the parquet scan
    (plan gate in test_plan_quality); the aggregate is a single exact
    decimal sum, partial per split. At 100 TB this is the shape that
    proves pushdown: the scan must report PushedFilters on shipdate/
    discount/quantity and read only the four referenced columns."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(6,2)")
    ).cast("double")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(rev.alias("revenue"), F.count("*").cast("bigint").alias("n"))
    )


@query(
    "q72_tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(6,2)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem JOIN part ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON c_nationkey = n1.n_nationkey
                    JOIN region ON n1.n_regionkey = r_regionkey
                    JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the deepest join tree in the
    battery — lineitem up through part, supplier, orders, customer, and
    nation twice (customer's nation restricts the market region, supplier's
    nation is the share numerator). Share = conditional sum / total sum,
    both exact decimals, divided as doubles only at the end. Every
    dimension side broadcasts; lineitem->orders is the one shuffle join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("cust_nkey")
    )
    n2 = n.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation"))
    vol = F.col("volume")
    num = F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0).cast("decimal(18,4)"))).cast("double")
    den = F.sum(vol).cast("double")
    return (
        # the selective broadcast part filter runs BEFORE the one shuffle
        # join (opt r11, guide §3.2): only ECONOMY lineitem rows reach the
        # lineitem<->orders exchange, cutting its shuffle bytes by the part
        # selectivity at any scale; inner joins commute so output is
        # unchanged (oracle hash identical)
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(F.round(num / den, 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q73_tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(ROUND({REVENUE_SQL}, 2) AS DOUBLE) AS profit
    FROM (
      SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice, l_discount
      FROM lineitem JOIN part ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation per
    order year for parts matching a name pattern. The fixture has no
    ps_supplycost so profit is the discounted revenue (the join tree and
    the LIKE-driven part prune are the shape). The part LIKE filter prunes
    before its broadcast; group keys (25 nations x ~7 years) are tiny so
    the final aggregate is all map-side."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q74_tpch_q11_important_stock",
    oracle="""
    WITH vals AS (
      SELECT l_partkey AS p_key,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(6,2))) AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AFRICA'
      GROUP BY l_partkey
    )
    SELECT p_key, CAST(ROUND(value, 2) AS DOUBLE) AS value
    FROM vals
    WHERE value * 1000 > (SELECT SUM(value) FROM vals)
    ORDER BY value DESC, p_key
    """,
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value restricted to one
    region's suppliers, kept only where the part exceeds a fraction of the
    RELATION-WIDE total — the group-by + HAVING-over-scalar-subquery shape.
    The fraction test is cross-multiplied (value * 1000 > total) so both
    engines compare exact decimals, no division. The scalar total is a
    1-row re-aggregate of the grouped frame, broadcast into the filter —
    the grouped data is shuffled once and reused for both sides."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    afr = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(afr), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(_rev()).alias("value"))
    )
    total = vals.agg(F.sum("value").alias("total"))
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select("p_key", F.round(F.col("value"), 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), "p_key")
    )


@query(
    "q75_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): LEFT join with a filter INSIDE
    the join condition (customers with zero qualifying orders must survive
    with c_count = 0 — pushing the priority filter below the join as a
    WHERE would silently drop them), then a second aggregation over the
    first's result. COUNT(o_orderkey) counts non-null matches only. The
    o_orderpriority <> '5-LOW' predicate plays the original's
    o_comment NOT LIKE exclusion."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q76_tpch_q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(6,2))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(6,2))) AS DOUBLE),
                 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-share aggregate — promo
    revenue as a percentage of one month's total. Both sums are exact
    decimals; the ratio is the only double op, computed once on the final
    1-row frame. The month filter pushes to the lineitem scan; part
    broadcasts carrying only (p_partkey, p_type)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(18,4)"))
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * promo / total, 4).alias("promo_revenue_pct"))
    )


@query(
    "q77_tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(6,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the view-plus-scalar-max shape — quarterly
    revenue per supplier, keep the supplier(s) hitting the global max.
    Equality against the max is safe because the per-supplier revenue is
    an exact decimal sum in both engines. The grouped frame is computed
    once; its 1-row max re-aggregate broadcasts into the filter."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    mx = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round(F.col("total_rev"), 2).cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "q78_tpch_q16_supplier_part_counts",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 14, 19, 25, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-count of
    suppliers per (brand, type, size) bucket with a NOT-IN exclusion
    subquery (negative-balance suppliers play the original's complaint
    filter). The NOT IN decorelates to a broadcast anti-join (supplier is
    100 rows); the distinct-count shuffles once on the grouping key with
    the pair-dedup folded into the same aggregation."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.select("l_partkey", "l_suppkey").distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q79_tpch_q20_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped sh
        WHERE sh.qty * 5 > (SELECT SUM(qty) FROM shipped sh2
                            WHERE sh2.l_partkey = sh.l_partkey))
    ORDER BY s_name
    """,
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested
    semi-join-with-correlated-threshold — suppliers who shipped more than
    20% of a qualifying part's total volume (the original compares
    ps_availqty to half the shipped quantity; the fixture keeps the
    correlated-aggregate comparison with lineitem on both sides). The
    per-part total decorrelates into a groupBy(partkey) joined back to the
    per-(supp, part) sums; the threshold cross-multiplies (qty * 5 >
    total) so both engines compare exact decimals. The qualifying supplier
    set is a semi join into the region-filtered supplier dimension."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_qty()).alias("qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    qualifying = (
        shipped.join(F.broadcast(totals), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") * 5 > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q80_tpch_q21_waiting_suppliers",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey, l_suppkey,
             CAST(l_shipdate > o_orderdate + INTERVAL 60 DAY AS INT) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier JOIN lines l1 ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the double
    EXISTS / NOT-EXISTS — count, per supplier, the finished multi-supplier
    orders where THIS supplier shipped late (>60 days after the order
    date; the fixture has no receipt/commit dates) and no other supplier
    did. Both correlated EXISTS decorrelate into a TWO-LEVEL aggregate:
    first (order, supplier) with its late-line count, then per-order
    supplier/late-supplier tallies — every aggregate non-distinct, so no
    Expand duplication (a countDistinct pair triples the shuffled rows;
    16x probe ratio fell 8.5 -> 1.08 after this rewrite) and the
    fact side is joined and shuffled exactly once. An order qualifies
    when n_supp > 1 AND n_late_supp == 1; numwait sums that supplier's
    late LINES in qualifying orders (reference Q21 counts l1 rows, not
    orders — a supplier late twice in one order scores 2)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    lines = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .cast("int").alias("late"),
        )
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").alias("n_late_lines")
    )
    late = F.col("n_late_lines") > 0
    profile = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(late.cast("int")).alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(late, F.col("n_late_lines")).otherwise(0)).alias("late_lines"),
    )
    return (
        profile.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q81_tpch_q22_global_sales_opportunity",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
             SUBSTR(c_name, LENGTH(c_name) - 1, 2) AS cntrycode
      FROM customer
      WHERE SUBSTR(c_name, LENGTH(c_name) - 1, 2)
            IN ('13', '31', '23', '29', '30', '18', '17')
    ),
    thresh AS (SELECT SUM(bal) AS tot, COUNT(*) AS n FROM cust WHERE bal > 0)
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS totacctbal
    FROM cust, thresh
    WHERE bal * n > tot
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): anti-join (customers with NO
    orders) against a relation-wide scalar threshold (above-average
    balance). Country codes are the trailing two digits of c_name (the
    fixture has no c_phone). The average test is cross-multiplied
    (bal * n > total) over exact decimals so neither engine divides.
    The orders anti-join shuffles on custkey; the threshold is a 1-row
    broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    code = F.expr("substr(c_name, length(c_name) - 1, 2)")
    cust = (
        c.select(
            "c_custkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
            code.alias("cntrycode"),
        )
        .filter(F.col("cntrycode").isin("13", "31", "23", "29", "30", "18", "17"))
    )
    thresh = cust.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("tot"), F.count("*").alias("n")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("bal") * F.col("n") > F.col("tot"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum("bal"), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
