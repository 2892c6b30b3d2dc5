"""Dataset profiling / audit operators: key-skew diagnostics, a
data-quality expectation audit, and a-priori frequent-pair mining.

These are the operational companions to the scale levers in
``queries_scale.py``: before you choose salting (``skew_salted_join``) or
bucketing (``q51``) you measure the key distribution (``q98``); before you
train on a corpus you audit it (``q100``); and basket-style co-occurrence
mining (``q101``) is the classic two-pass a-priori dataflow whose pruning
step IS the 100 TB survival trick (never build the pair space of infrequent
items).

All three are exact integer/count outputs, hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query, retain

#: heavy hitters reported by the skew profiler
HH_TOP = 10

_Q98_ORACLE = f"""
WITH counts AS (
  SELECT l_suppkey AS key, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_suppkey
),
tot AS (
  SELECT SUM(cnt) AS total, COUNT(*) AS n_keys,
         MAX(cnt) AS max_cnt, MIN(cnt) AS min_cnt,
         quantile_cont(cnt, 0.5) AS p50, quantile_cont(cnt, 0.99) AS p99
  FROM counts
),
hh AS (
  SELECT 'heavy_hitter' AS kind,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk,
         key, cnt,
         CAST((cnt * 10000) // (SELECT total FROM tot) AS BIGINT) AS bp
  FROM counts
  ORDER BY cnt DESC, key LIMIT {HH_TOP}
),
summary AS (
  SELECT 'n_keys' AS kind, CAST(0 AS BIGINT) AS rk,
         CAST(NULL AS BIGINT) AS key, n_keys AS cnt,
         CAST(NULL AS BIGINT) AS bp FROM tot
  UNION ALL
  SELECT 'total_rows', 0, NULL, total, NULL FROM tot
  UNION ALL
  -- max/avg skew factor in basis points: 10000 = perfectly uniform
  SELECT 'max_over_avg_bp', 0, NULL, NULL,
         CAST((max_cnt * 10000 * n_keys) // total AS BIGINT) FROM tot
  UNION ALL
  SELECT 'p99_over_p50_bp', 0, NULL, NULL,
         CAST(FLOOR(p99 * 10000 / p50) AS BIGINT) FROM tot
  UNION ALL
  SELECT 'max_over_min_bp', 0, NULL, NULL,
         CAST((max_cnt * 10000) // min_cnt AS BIGINT) FROM tot
)
SELECT kind, CAST(rk AS BIGINT) AS rk, key, CAST(cnt AS BIGINT) AS cnt, bp
FROM (SELECT * FROM hh UNION ALL SELECT * FROM summary)
ORDER BY kind, rk, key
"""


@query("q98_skew_diagnostics", oracle=_Q98_ORACLE)
def q98_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key distribution profiler: per-key counts of
    ``lineitem.l_suppkey`` reduced to the top-10 heavy hitters (with
    basis-point share) plus summary skew metrics (max/avg, p99/p50,
    max/min ratios in basis points — 10000 = perfectly uniform). This is
    the measurement you run BEFORE choosing a skew mitigation
    (``skew_salted_join``) or a bucket layout (``q51``).

    Scale: the per-key count is one map-side-combinable groupBy on the
    join key; everything downstream (ranking, ratios) runs on the
    key-cardinality frame, which is orders of magnitude smaller than the
    fact table. All ratios are integer basis points so the report
    hash-verifies cross-engine.
    """
    counts = retain(
        "q98_counts",
        # three consumers (heavy hitters, the hh share denominator, the
        # summary aggregate) would otherwise each rescan the fact table;
        # the counts frame is key-cardinality — persist it (keyed, so
        # re-invocations don't stack caches) and the whole profiler reads
        # the fact ONCE (plan-gated)
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt")),
    )
    tot = counts.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
    )
    hh = (
        counts.withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("cnt"), "key")).cast("bigint")
        )
        .filter(F.col("rk") <= HH_TOP)
        .crossJoin(F.broadcast(tot.select("total")))
        .select(
            F.lit("heavy_hitter").alias("kind"),
            "rk",
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            # integer DIV, matching the oracle's `//` exactly (the summary
            # rows already do) — double division re-cast to bigint can
            # diverge at extreme totals
            F.expr("(cnt * 10000) DIV total").alias("bp"),
        )
    )
    nb = F.lit(None).cast("bigint")
    summary = tot.select(
        F.array(
            F.struct(F.lit("n_keys").alias("kind"), F.col("n_keys").cast("bigint").alias("cnt"), nb.alias("bp")),
            F.struct(F.lit("total_rows").alias("kind"), F.col("total").cast("bigint").alias("cnt"), nb.alias("bp")),
            F.struct(
                F.lit("max_over_avg_bp").alias("kind"),
                nb.alias("cnt"),
                F.expr("CAST((max_cnt * 10000 * n_keys) DIV total AS BIGINT)").alias("bp"),
            ),
            F.struct(
                F.lit("p99_over_p50_bp").alias("kind"),
                nb.alias("cnt"),
                F.expr("CAST(FLOOR(p99 * 10000 / p50) AS BIGINT)").alias("bp"),
            ),
            F.struct(
                F.lit("max_over_min_bp").alias("kind"),
                nb.alias("cnt"),
                F.expr("CAST((max_cnt * 10000) DIV min_cnt AS BIGINT)").alias("bp"),
            ),
        ).alias("rows")
    ).select(F.explode("rows").alias("r")).select(
        F.col("r.kind").alias("kind"),
        F.lit(0).cast("bigint").alias("rk"),
        nb.alias("key"),
        F.col("r.cnt").alias("cnt"),
        F.col("r.bp").alias("bp"),
    )
    return hh.unionByName(summary).orderBy("kind", "rk", "key")


_Q100_ORACLE = """
WITH o AS (
  SELECT COUNT(*) AS n,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_pk,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
         SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS null_date
  FROM orders
),
l AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN l_quantity < 1 OR l_quantity > 60 THEN 1 ELSE 0 END) AS bad_qty,
         SUM(CASE WHEN l_discount < 0 OR l_discount > 0.2 THEN 1 ELSE 0 END) AS bad_disc,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_ship
  FROM lineitem
),
d AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 1 ELSE 0 END) AS empty_text,
         SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END) AS bad_len
  FROM documents
),
fk_o AS (
  SELECT COUNT(*) AS v FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
),
fk_l AS (
  SELECT COUNT(*) AS v FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
),
checks AS (
  SELECT 'orders' AS table_name, 'pk_unique' AS check_name, n AS checked_rows, dup_pk AS violations FROM o
  UNION ALL SELECT 'orders', 'totalprice_positive', n, bad_price FROM o
  UNION ALL SELECT 'orders', 'orderdate_not_null', n, null_date FROM o
  UNION ALL SELECT 'orders', 'custkey_fk_customer', n, (SELECT v FROM fk_o) FROM o
  UNION ALL SELECT 'lineitem', 'quantity_in_1_60', n, bad_qty FROM l
  UNION ALL SELECT 'lineitem', 'discount_in_0_to_0.2', n, bad_disc FROM l
  UNION ALL SELECT 'lineitem', 'shipdate_not_null', n, null_ship FROM l
  UNION ALL SELECT 'lineitem', 'orderkey_fk_orders', n, (SELECT v FROM fk_l) FROM l
  UNION ALL SELECT 'documents', 'text_nonempty', n, empty_text FROM d
  UNION ALL SELECT 'documents', 'n_chars_matches_text', n, bad_len FROM d
)
SELECT table_name, check_name,
       CAST(checked_rows AS BIGINT) AS checked_rows,
       CAST(violations AS BIGINT) AS violations,
       violations = 0 AS ok
FROM checks
ORDER BY table_name, check_name
"""


@query("q100_data_quality_checks", oracle=_Q100_ORACLE)
def q100_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite data audit: one row per declared check
    ``(table, check, checked_rows, violations, ok)`` covering primary-key
    uniqueness, NULL and range expectations, referential integrity
    (orders→customer, lineitem→orders), and derived-column consistency
    (``documents.n_chars == length(text)``). This is a *profiler*, not a
    gate — violation counts are data (hash-verified vs DuckDB), so the
    same operator reports on dirty corpora instead of refusing them.

    Scale: each table contributes ONE conditional-aggregation scan
    (``SUM(CASE WHEN ...)`` columns fold into a single partial agg); the
    FK checks are anti-join counts whose dimension side (customer /
    orders keys) broadcasts. No window, no per-row UDF, no second pass.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    d = table(spark, sf_dir, "documents")
    c = table(spark, sf_dir, "customer")

    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("bad_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("null_date"),
    )
    l_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 60), 1).otherwise(0)).alias("bad_qty"),
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.2), 1).otherwise(0)).alias("bad_disc"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias("null_ship"),
    )
    d_agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)).alias("empty_text"),
        F.sum(F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)).alias("bad_len"),
    )
    fk_o = o.join(
        F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("v"))
    fk_l = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("v"))

    def rows(agg: DataFrame, tbl: str, checks: list[tuple[str, str]]) -> DataFrame:
        structs = [
            F.struct(
                F.lit(tbl).alias("table_name"),
                F.lit(name).alias("check_name"),
                F.col("n").cast("bigint").alias("checked_rows"),
                F.col(col).cast("bigint").alias("violations"),
            )
            for name, col in checks
        ]
        return agg.select(F.explode(F.array(*structs)).alias("r")).select("r.*")

    fk_o_row = o_agg.crossJoin(fk_o).select(
        F.lit("orders").alias("table_name"),
        F.lit("custkey_fk_customer").alias("check_name"),
        F.col("n").cast("bigint").alias("checked_rows"),
        F.col("v").cast("bigint").alias("violations"),
    )
    fk_l_row = l_agg.crossJoin(fk_l).select(
        F.lit("lineitem").alias("table_name"),
        F.lit("orderkey_fk_orders").alias("check_name"),
        F.col("n").cast("bigint").alias("checked_rows"),
        F.col("v").cast("bigint").alias("violations"),
    )
    out = (
        rows(o_agg, "orders", [("pk_unique", "dup_pk"), ("totalprice_positive", "bad_price"), ("orderdate_not_null", "null_date")])
        .unionByName(rows(l_agg, "lineitem", [("quantity_in_1_60", "bad_qty"), ("discount_in_0_to_0.2", "bad_disc"), ("shipdate_not_null", "null_ship")]))
        .unionByName(rows(d_agg, "documents", [("text_nonempty", "empty_text"), ("n_chars_matches_text", "bad_len")]))
        .unionByName(fk_o_row)
        .unionByName(fk_l_row)
    )
    return out.withColumn("ok", F.col("violations") == 0).orderBy(
        "table_name", "check_name"
    )


#: floor on the adaptive minimum support (small-fixture behavior)
MINSUP = 3
#: one support unit per this many baskets (relative support 0.002%): the
#: threshold scales with the corpus, like a real market-basket run — a
#: FIXED absolute support at growing data makes every observed pair
#: "frequent" (the x16 probe measured exactly that failure mode before
#: this was made adaptive, docs/scale_probe_new_ops_r7.json)
SUP_PER_BASKETS = 50000

_Q101_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
minsup AS (
  SELECT GREATEST({MINSUP}, COUNT(DISTINCT basket) // {SUP_PER_BASKETS}) AS s
  FROM baskets
),
l1 AS (
  SELECT item FROM baskets GROUP BY item
  HAVING COUNT(*) >= (SELECT s FROM minsup)
),
pruned AS (
  SELECT basket, item FROM baskets WHERE item IN (SELECT item FROM l1)
),
pairs AS (
  SELECT a.item AS part_a, b.item AS part_b, COUNT(*) AS support
  FROM pruned a JOIN pruned b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= (SELECT s FROM minsup)
)
SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
       (SELECT CAST(s AS BIGINT) FROM minsup) AS min_support
FROM pairs
ORDER BY support DESC, part_a, part_b
"""


@query("q101_frequent_pairs_apriori", oracle=_Q101_ORACLE)
def q101_frequent_pairs_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-pair mining with the a-priori prune: parts
    that co-occur in >= min_support orders, computed as (1) distinct
    (order, part) baskets, (2) an ADAPTIVE minimum support
    ``max(MINSUP, n_baskets DIV SUP_PER_BASKETS)`` — relative support, so
    the threshold (and therefore the pruned plan) survives corpus growth;
    the oracle derives the SAME threshold from its own COUNT(DISTINCT), so
    the adaptive path itself is hash-verified — (3) frequent singletons
    L1, (4) a within-basket self-join restricted to L1 items, (5) pair
    counts filtered at min_support (emitted per row as ``min_support``).

    Scale: the a-priori property — every frequent pair has two frequent
    items — is the whole trick. L1 is a key-cardinality frame (small; it
    broadcasts into a semi-join that prunes the baskets BEFORE the
    quadratic self-join), so the pair space is built only over items that
    can still qualify. The self-join shuffles on the basket key; a basket
    with B surviving items contributes B*(B-1)/2 pair rows, so a
    pathological mega-basket is the residual skew risk — cap or salt the
    basket key if a real corpus has one (the fixture's baskets are
    bounded by order size).
    """
    baskets = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item"))
        .dropDuplicates(["basket", "item"])
    )
    minsup = baskets.agg(
        F.greatest(
            F.lit(MINSUP).cast("bigint"),
            F.expr(f"count(DISTINCT basket) DIV {SUP_PER_BASKETS}"),
        ).alias("s")
    )
    l1 = (
        baskets.groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(minsup))
        .filter(F.col("c") >= F.col("s"))
        .select("item")
    )
    pruned = baskets.join(F.broadcast(l1), "item", "left_semi")
    a = pruned.select(F.col("basket"), F.col("item").alias("part_a"))
    b = pruned.select(F.col("basket"), F.col("item").alias("part_b"))
    pairs = (
        a.join(b, ["basket"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .crossJoin(F.broadcast(minsup))
        .filter(F.col("support") >= F.col("s"))
    )
    return pairs.select(
        "part_a", "part_b", "support", F.col("s").cast("bigint").alias("min_support")
    ).orderBy(F.desc("support"), "part_a", "part_b")


#: BOM roots (smallest part keys; the derived edge rule makes partkey p the
#: parent of 2p+1 and 2p+2, a binary forest over the part table)
BOM_ROOTS = 8

_Q102_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT p_partkey AS parent, 2 * p_partkey + 1 AS child,
         p_partkey % 3 + 1 AS q
  FROM part WHERE 2 * p_partkey + 1 <= (SELECT MAX(p_partkey) FROM part)
  UNION ALL
  SELECT p_partkey, 2 * p_partkey + 2, p_partkey % 5 + 1
  FROM part WHERE 2 * p_partkey + 2 <= (SELECT MAX(p_partkey) FROM part)
),
bom(root, p, qty, depth) AS (
  SELECT p_partkey, p_partkey, CAST(1 AS BIGINT), 0
  FROM part WHERE p_partkey < {BOM_ROOTS}
  UNION ALL
  SELECT b.root, e.child, b.qty * e.q, b.depth + 1
  FROM bom b JOIN edges e ON e.parent = b.p
)
SELECT root, CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(MAX(depth) AS BIGINT) AS max_depth
FROM bom
GROUP BY root
ORDER BY root
"""


@query("q102_recursive_cte_bom", oracle=_Q102_SQL)
def q102_recursive_cte_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials rollup via Spark 4's ``WITH RECURSIVE`` — the
    hierarchical-query surface (org charts, BOM explosions, graph
    reachability) that previously required a driver-side iteration loop
    (cf. the large-star/small-star kernel in ``pipeline/cluster.py``).
    Edges derive deterministically from the part table (partkey p parents
    2p+1 / 2p+2 with small integer per-edge quantities), so the closure —
    per-root component count, multiplied-quantity total, max depth — is
    pure BIGINT arithmetic and the *identical* SQL string runs on DuckDB.

    Scale: a recursive CTE executes as one self-join per level on the
    frontier (here <= log2(|part|) + 1 levels); each level shuffles only
    the frontier on the parent key, and quantities multiply down paths —
    the exact plan a hand-written iterative loop would issue, minus the
    driver round-trips. Catalyst's recursion (maxRecursion guard) bounds
    runaway depth.
    """
    from limeqo_spark.io import register_views

    register_views(spark, sf_dir, ("part",))
    return spark.sql(_Q102_SQL)


_Q104_ORACLE = """
WITH s AS (
  SELECT
    COUNT(*) AS n,
    COUNT(o_orderkey) AS nn_key, COUNT(DISTINCT o_orderkey) AS ndv_key,
    MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
    COUNT(o_custkey) AS nn_cust, COUNT(DISTINCT o_custkey) AS ndv_cust,
    MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
    COUNT(o_orderstatus) AS nn_st, COUNT(DISTINCT o_orderstatus) AS ndv_st,
    COUNT(o_orderpriority) AS nn_pr, COUNT(DISTINCT o_orderpriority) AS ndv_pr,
    COUNT(o_totalprice) AS nn_tp, COUNT(DISTINCT o_totalprice) AS ndv_tp,
    ROUND(MIN(o_totalprice), 2) AS min_tp, ROUND(MAX(o_totalprice), 2) AS max_tp,
    COUNT(o_orderdate) AS nn_dt, COUNT(DISTINCT o_orderdate) AS ndv_dt
  FROM orders
)
SELECT * FROM (
  SELECT 'o_orderkey' AS col, CAST(n AS BIGINT) AS n_rows,
         CAST(n - nn_key AS BIGINT) AS n_nulls, CAST(ndv_key AS BIGINT) AS ndv,
         CAST(min_key AS DOUBLE) AS min_v, CAST(max_key AS DOUBLE) AS max_v FROM s
  UNION ALL
  SELECT 'o_custkey', n, n - nn_cust, ndv_cust,
         CAST(min_cust AS DOUBLE), CAST(max_cust AS DOUBLE) FROM s
  UNION ALL
  SELECT 'o_orderstatus', n, n - nn_st, ndv_st, NULL, NULL FROM s
  UNION ALL
  SELECT 'o_orderpriority', n, n - nn_pr, ndv_pr, NULL, NULL FROM s
  UNION ALL
  SELECT 'o_totalprice', n, n - nn_tp, ndv_tp, min_tp, max_tp FROM s
  UNION ALL
  SELECT 'o_orderdate', n, n - nn_dt, ndv_dt, NULL, NULL FROM s
)
ORDER BY col
"""


@query("q104_table_stats_profile", oracle=_Q104_ORACLE)
def q104_table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics in ONE table pass: per column of
    ``orders`` — row count, null count, exact NDV, and numeric min/max —
    the statistics a CBO (or a data engineer sizing a join) reads first;
    the operational sibling of ``q98`` (key skew) and ``q100``
    (expectations). Exact COUNT(DISTINCT) on several columns in one
    aggregate makes Spark plan an Expand (one row replica per distinct
    aggregate) — the classic trade documented here: at 100 TB you swap
    exact NDV for HLL sketches (``corpus_sketch_profile``) and keep the
    single pass; the profiler's SHAPE (one scan, column-per-row report)
    is unchanged.
    """
    o = table(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("ndv_key"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("ndv_cust"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
        F.count("o_orderstatus").alias("nn_st"),
        F.countDistinct("o_orderstatus").alias("ndv_st"),
        F.count("o_orderpriority").alias("nn_pr"),
        F.countDistinct("o_orderpriority").alias("ndv_pr"),
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("ndv_tp"),
        F.round(F.min("o_totalprice"), 2).alias("min_tp"),
        F.round(F.max("o_totalprice"), 2).alias("max_tp"),
        F.count("o_orderdate").alias("nn_dt"),
        F.countDistinct("o_orderdate").alias("ndv_dt"),
    )
    nd = F.lit(None).cast("double")

    def row(col: str, nn: str, ndv: str, mn=None, mx=None):
        return F.struct(
            F.lit(col).alias("col"),
            F.col("n").cast("bigint").alias("n_rows"),
            (F.col("n") - F.col(nn)).cast("bigint").alias("n_nulls"),
            F.col(ndv).cast("bigint").alias("ndv"),
            (F.col(mn).cast("double") if mn else nd).alias("min_v"),
            (F.col(mx).cast("double") if mx else nd).alias("max_v"),
        )

    return (
        s.select(
            F.explode(
                F.array(
                    row("o_orderkey", "nn_key", "ndv_key", "min_key", "max_key"),
                    row("o_custkey", "nn_cust", "ndv_cust", "min_cust", "max_cust"),
                    row("o_orderstatus", "nn_st", "ndv_st"),
                    row("o_orderpriority", "nn_pr", "ndv_pr"),
                    row("o_totalprice", "nn_tp", "ndv_tp", "min_tp", "max_tp"),
                    row("o_orderdate", "nn_dt", "ndv_dt"),
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("col")
    )


#: hot-part df cap for the co-supply graph build: a part supplied by more
#: than this many suppliers is dropped before the per-part supplier pairing
#: (same contract as dedup_ngram_jaccard_capped's max_doc_freq — a
#: ubiquitous item is uninformative for co-occurrence affinity AND its pair
#: set is quadratic, the classic hot-key stage-killer). TPC-H parts have at
#: most 4 suppliers at EVERY scale factor, so the cap never binds on the
#: fixtures (output provably identical) — it exists for real-world corpora.
PART_SUP_CAP = 64

#: shared edge-build CTEs for the co-supply graph (q106 triangles + q107
#: PageRank) — the oracle derives the identical hot-part cap and adaptive
#: p90 threshold, so the edge set is hash-verified end-to-end
_CO_EDGE_CTES = f"""
bip AS (
  SELECT DISTINCT l_partkey AS part, l_suppkey AS sup FROM lineitem
),
bipc AS (
  -- hot-part df cap (never binds on TPC-H: <= 4 suppliers per part)
  SELECT part, sup FROM bip
  WHERE part NOT IN (
    SELECT part FROM bip GROUP BY part HAVING COUNT(*) > {PART_SUP_CAP}
  )
),
co AS (
  SELECT a.sup AS a, b.sup AS b, COUNT(*) AS c
  FROM bipc a JOIN bipc b ON a.part = b.part AND a.sup < b.sup
  GROUP BY a.sup, b.sup
),
thresh AS (
  -- adaptive cutoff at the 90th percentile of co-supply counts: the edge
  -- set stays ~10% of candidate pairs at EVERY scale factor (a mean-based
  -- cutoff drifts with the SF-dependent count distribution)
  SELECT CAST(FLOOR(quantile_cont(c, 0.9)) AS BIGINT) + 1 AS t FROM co
),
edges AS (
  SELECT a, b FROM co WHERE c >= (SELECT t FROM thresh)
)"""


def _co_supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the supplier co-supply edge list ``(a, b)`` shared by q106/q107:
    suppliers sharing >= an adaptive (p90+1) number of distinct parts, with
    parts hotter than :data:`PART_SUP_CAP` suppliers dropped BEFORE the
    per-part pairing so one celebrity part can't materialize a quadratic
    pair set (the `dedup_ngram_jaccard_capped` df-cap pattern; hot parts
    are few by construction, so the cap set broadcasts). Returned frame is
    ``localCheckpoint(eager=True)``-materialized: both consumers' multi-way
    plans read it without replaying the fact-table self-join, and the
    blocks are auto-cleaned once the frame is unreferenced (no pinned
    cache entry)."""
    bip = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("sup"))
        .dropDuplicates(["part", "sup"])
    )
    hot = (
        bip.groupBy("part")
        .agg(F.count(F.lit(1)).alias("nsup"))
        .filter(F.col("nsup") > PART_SUP_CAP)
        .select("part")
    )
    bipc = bip.join(F.broadcast(hot), "part", "left_anti")
    # pair generation stays a per-part SELF-JOIN on purpose: the r8 probe
    # tried the adjacency-list alternative (groupBy part -> sorted
    # supplier array -> C(n,2) pairs via one higher-order transform) and
    # it was 34% faster at x1 but 2.3x SLOWER at x16 (68.7 s vs 29.7 s) —
    # HOF lambdas are interpreted per element and the pair space here is
    # ~1e9 struct allocations at x16, while the join's pair stream stays
    # inside whole-stage codegen. The co subtree below feeds BOTH the
    # percentile threshold and the edge filter; Spark's ReuseExchange
    # dedupes its shuffle so the pair space is generated once (verified
    # in the q106 formatted plan).
    a = bipc.select("part", F.col("sup").alias("a"))
    b = bipc.select("part", F.col("sup").alias("b"))
    co = (
        a.join(b, ["part"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        # co feeds TWO consumers (the percentile threshold and the edge
        # filter) and is the most expensive subtree of the whole build
        # (~1e9 pre-agg pair rows at the x16 probe); the threshold's
        # collect runs as its own job, outside AQE's stage-reuse reach, so
        # without materialization the pair space is generated twice —
        # measured r8 at x16: 17-19 s checkpointed vs 21-35 s relying on
        # reuse. The materialized frame is only the AGGREGATED co matrix
        # (key-pair cardinality), never the pre-agg pair stream.
        .localCheckpoint(eager=True)
    )
    thresh = co.agg(
        F.expr("CAST(FLOOR(percentile(c, 0.9)) AS BIGINT) + 1").alias("t")
    )
    return (
        co.crossJoin(F.broadcast(thresh))
        .filter(F.col("c") >= F.col("t"))
        .select("a", "b")
        .localCheckpoint(eager=True)
    )


_Q106_ORACLE = f"""
WITH {_CO_EDGE_CTES},
tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
pern AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM pern GROUP BY node
ORDER BY n_triangles DESC, node
"""


@query("q106_triangle_count", oracle=_Q106_ORACLE)
def q106_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting with DEGREE ORIENTATION — the graph
    analytics class beyond connected components (`pipeline/cluster.py`):
    build a supplier co-supply graph (suppliers sharing >= an adaptive
    threshold of distinct parts — floor(p90 of co-counts)+1, derived
    identically by the oracle, so the adaptive edge set is hash-verified),
    then count triangles per node. The graph build drops parts hotter
    than :data:`PART_SUP_CAP` suppliers before pairing (never binds on
    TPC-H; see :func:`_co_supply_edges`).

    The Spark side uses the orientation trick that makes this survive
    skew at 100 TB: orient every edge from the lower-(degree, id) to the
    higher endpoint, enumerate wedges only from each node's OUT-neighbors
    (every triangle then has exactly ONE wedge apex — its smallest
    vertex), and close them with a join against the oriented edge set.
    Out-degrees are bounded by O(sqrt(m)) under this orientation, so a
    celebrity node never materializes a quadratic wedge set — the plain
    u<v<w 3-way self-join the DuckDB oracle runs (same triangle set, so
    the hash proves the oriented plan's equivalence) would.
    """
    edges = _co_supply_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                F.struct("da", "a") < F.struct("db", "b"), F.struct(F.col("a").alias("n"), F.col("da").alias("d"))
            )
            .otherwise(F.struct(F.col("b").alias("n"), F.col("db").alias("d")))
            .alias("src"),
            F.when(
                F.struct("da", "a") < F.struct("db", "b"), F.struct(F.col("b").alias("n"), F.col("db").alias("d"))
            )
            .otherwise(F.struct(F.col("a").alias("n"), F.col("da").alias("d")))
            .alias("dst"),
        )
        .select(
            F.col("src.n").alias("src"),
            F.col("dst.n").alias("dst"),
            F.col("dst.d").alias("dst_deg"),
        )
    )
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("dst_deg").alias("dv"))
    w2 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("dst_deg").alias("dw"))
    wedges = w1.join(w2, ["u"]).filter(
        F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
    )
    closing = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi").select("u", "v", "w")
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "node")
    )


#: PageRank fixed-point scale, damping (85/100), unrolled iterations
PR_SCALE, PR_ITERS = 1_000_000, 3

_Q107_EDGE_CTES = f"""{_CO_EDGE_CTES},
sym AS (
  SELECT a AS src, b AS dst FROM edges
  UNION ALL SELECT b, a FROM edges
),
deg AS (
  SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src
)"""


def _pr_iter_ctes(k: int) -> str:
    out = [f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg)"]
    for i in range(1, k + 1):
        out.append(f"""
r{i} AS (
  SELECT s.dst AS node,
         {int(0.15 * PR_SCALE)} + (85 * SUM(p.r // d.d)) // 100 AS r
  FROM sym s
  JOIN r{i - 1} p ON p.node = s.src
  JOIN deg d ON d.node = s.src
  GROUP BY s.dst
)""")
    return ",".join(out)


_Q107_ORACLE = f"""
WITH {_Q107_EDGE_CTES},
{_pr_iter_ctes(PR_ITERS)}
SELECT node, CAST(r AS BIGINT) AS rank_fp
FROM r{PR_ITERS}
ORDER BY rank_fp DESC, node
"""


@query("q107_pagerank_fixed_point", oracle=_Q107_ORACLE)
def q107_pagerank_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the q106 co-supply graph — the iterative-propagation
    graph class (CC and triangles being the other two) — in EXACT
    fixed-point integer arithmetic so an inherently iterative float
    algorithm hash-verifies cross-engine: ranks are integers scaled by
    1e6, each edge contributes ``rank DIV degree`` (integer division
    BEFORE the sum, so aggregation order cannot perturb the result), and
    the damped update is ``150000 + (85 * sum) DIV 100``. Three unrolled
    iterations, identical CTE chain on DuckDB.

    Scale: each iteration is one shuffle keyed by the edge source (join
    ranks) plus one by destination (the sum) — the standard Pregel-style
    plan; the fixture's driver-side unroll is the bounded-K form, and the
    iterative production form adds localCheckpoint lineage truncation per
    round (the `connected_components_min_label` pattern). The graph build
    (shared with q106, hot-part df cap included) is checkpoint-
    materialized once; the 2x-per-iteration sym frame likewise, so no
    consumer replays the fact-table self-join and no cache entry outlives
    the frame (ContextCleaner reclaims checkpoint blocks on GC).
    """
    edges = _co_supply_edges(spark, sf_dir)
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select("node", F.lit(PR_SCALE).cast("bigint").alias("r"))
    base = int(0.15 * PR_SCALE)
    for _ in range(PR_ITERS):
        contrib = (
            sym.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r DIV d").alias("share"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(base) + F.expr("(85 * SUM(share)) DIV 100")).cast("bigint").alias("r")
        )
    return ranks.select("node", F.col("r").alias("rank_fp")).orderBy(
        F.desc("rank_fp"), "node"
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             DATE_DIFF('day', MAX(CAST(o_orderdate AS DATE)), DATE '2002-01-01')
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY 1
    )
    SELECT custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary_cents,
           CAST(NTILE(4) OVER (ORDER BY recency_days, custkey) AS INT) AS r_q,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS INT) AS f_q,
           CAST(NTILE(4) OVER (ORDER BY monetary_cents DESC, custkey) AS INT) AS m_q
    FROM base ORDER BY custkey
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days since last order (anchored at
    a fixed date so the metric is reproducible), order count, and
    lifetime spend in integer cents; each metric quartiled with NTILE
    over a total order (custkey tiebreak — NTILE over a non-total order
    is engine-dependent at ties). Quartile 1 is always "best" (most
    recent / most frequent / highest spend).

    Scale (100 TB): the per-customer rollup is one partial-aggregated
    shuffle; the three NTILEs run over the CUSTOMER frame (orders of
    magnitude smaller than orders). NTILE needs a total sort — at
    extreme customer counts the swap is percent_rank against broadcast
    quantile cut-points (the q98/q104 profiler pattern); the fixture
    form keeps exact NTILE because the segment assignment near bucket
    boundaries is the part BI users reconcile against their warehouse."""
    o = table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(4)
        .over(W.orderBy("recency_days", "custkey"))
        .cast("int")
        .alias("r_q"),
        F.ntile(4)
        .over(W.orderBy(F.col("frequency").desc(), "custkey"))
        .cast("int")
        .alias("f_q"),
        F.ntile(4)
        .over(W.orderBy(F.col("monetary_cents").desc(), "custkey"))
        .cast("int")
        .alias("m_q"),
    ).orderBy("custkey")


@query(
    "supplier_spend_pareto",
    oracle="""
    WITH spend AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT suppkey, spend_cents,
             SUM(spend_cents) OVER (ORDER BY spend_cents DESC, suppkey
                                    ROWS UNBOUNDED PRECEDING) AS cum_cents,
             SUM(spend_cents) OVER () AS total_cents
      FROM spend
    )
    SELECT suppkey, spend_cents,
           CAST((CAST(cum_cents AS HUGEINT) * 10000) // total_cents AS BIGINT)
             AS cum_bps,
           CAST(CASE WHEN CAST(cum_cents AS HUGEINT) * 10
                          <= CAST(total_cents AS HUGEINT) * 8
                     THEN 1 ELSE 0 END AS INT) AS in_top80
    FROM ranked ORDER BY spend_cents DESC, suppkey
    """,
)
def supplier_spend_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) spend concentration: suppliers ranked by lifetime
    spend with exact-integer cumulative share in basis points and a flag
    for the head that covers ≤80% of total spend (``cum·10 ≤ total·8``
    — no float ratio near the boundary). The procurement-risk /
    vendor-consolidation primitive.

    Scale (100 TB): the per-supplier rollup is the only data-sized
    shuffle (partial-aggregated); the ranking windows run over the
    SUPPLIER frame. The running sum needs a total order — same
    trade-off as `customer_rfm_segments`, with the same documented
    extreme-cardinality swap (range-partitioned cumsum with per-shard
    offsets, the corpus_weighted_sample_pps pattern)."""
    li = table(spark, sf_dir, "lineitem")
    spend = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_cents")
    )
    w = W.orderBy(F.col("spend_cents").desc(), "suppkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ranked = spend.select(
        "suppkey",
        "spend_cents",
        F.sum("spend_cents").over(w).alias("cum_cents"),
        F.sum("spend_cents").over(W.partitionBy()).alias("total_cents"),
    )
    # widen BEFORE multiplying (review r8, confirmed by execution): with
    # bigint math, cum*10000 overflows past ~$9.2T total spend and Spark
    # (ANSI) aborts while DuckDB's window SUM silently widens to HUGEINT —
    # a cross-engine divergence at exactly the scale the operator claims.
    # DECIMAL(38,0) DIV and HUGEINT // both truncate identically.
    return ranked.select(
        "suppkey",
        "spend_cents",
        F.expr("(CAST(cum_cents AS DECIMAL(38,0)) * 10000) DIV total_cents")
        .cast("bigint")
        .alias("cum_bps"),
        F.when(
            F.col("cum_cents").cast("decimal(38,0)") * 10
            <= F.col("total_cents").cast("decimal(38,0)") * 8,
            1,
        ).otherwise(0).cast("int").alias("in_top80"),
    ).orderBy(F.col("spend_cents").desc(), "suppkey")
