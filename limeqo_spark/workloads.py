"""Steering-target workload registry: JOB-style SPJA queries over the
fixture tables, in the plan shapes the reference's workloads exercise
(JOB/CEB = multi-join order problems, DSB = TPC-DS-ish aggs with outer/
semi joins — SURVEY §2B intro). These are the queries the live steering
loop explores HintSets against; each has a genuinely different join
topology so hint sets separate (a broadcast-forbidden plan differs from
default on a star, a replicate-NL hint matters on the theta join, etc.).

``steering_workload(spark, sf_dir)`` returns the {query_id: builder}
mapping LiveSteeringSession consumes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import table


def steering_workload(
    spark: SparkSession, sf_dir: str
) -> dict[str, Callable[[], DataFrame]]:
    def t(name: str) -> DataFrame:
        return table(spark, sf_dir, name)

    def star_5way() -> DataFrame:
        # JOB-shape: fact + 4 dims through a key chain
        return (
            t("lineitem")
            .join(t("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
            .join(t("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(t("region"), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("r_name")
            .agg(F.count("*").alias("n"))
        )

    def chain_supplier() -> DataFrame:
        # chain through part/supplier sides of the fact
        return (
            t("lineitem")
            .join(t("part"), F.col("l_partkey") == F.col("p_partkey"))
            .join(t("supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
            .filter(F.col("p_size") < 25)
            .groupBy("p_brand", "s_nationkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )

    def selective_filter_join() -> DataFrame:
        # high-selectivity predicate before the join: broadcast-friendly
        hot = t("orders").filter(F.col("o_totalprice") > 400000)
        return (
            t("lineitem")
            .join(hot, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    def semi_anti_mix() -> DataFrame:
        # DSB-ish EXISTS/NOT EXISTS decorrelation target
        buyers = t("orders").select("o_custkey").distinct()
        return (
            t("customer")
            .join(buyers, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )

    def theta_window() -> DataFrame:
        # bounded non-equi self-join: replicate-NL territory
        e = t("events").select("user_id", "ts", "value")
        a = e.select(
            F.col("user_id").alias("u"), F.col("ts").alias("ta"), F.col("value").alias("va")
        )
        b = e.select(F.col("user_id").alias("u"), F.col("ts").alias("tb"))
        return (
            a.join(b, "u")
            .filter((F.col("tb") > F.col("ta")) & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 5 MINUTES")))
            .groupBy("u")
            .agg(F.count("*").alias("pairs"), F.sum("va").alias("v"))
        )

    def agg_rollup() -> DataFrame:
        # DSB/TPC-DS rollup shape
        return (
            t("orders")
            .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
            .rollup("c_mktsegment", "o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    def fact_fact() -> DataFrame:
        # two big sides: the sort-merge vs shuffle-hash decision point
        li = t("lineitem").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
        return (
            t("orders")
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter(F.col("qty") > 100)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )

    def skewed_dim() -> DataFrame:
        # low-cardinality hot join key (event_type)
        dim = t("events").select("event_type").distinct()
        return (
            t("events")
            .join(dim.withColumnRenamed("event_type", "et"), F.col("event_type") == F.col("et"))
            .groupBy("event_type")
            .agg(F.avg("value").alias("avg_v"))
        )

    def union_branches() -> DataFrame:
        # n-ary union feeding a join: the binarizer/steering must handle
        # union plans (SURVEY A23 note); two order slices deduped then
        # joined up to customer
        urgent = t("orders").filter(F.col("o_orderpriority") == "1-URGENT")
        big = t("orders").filter(F.col("o_totalprice") > 300000)
        u = urgent.unionByName(big).dropDuplicates(["o_orderkey"])
        return (
            u.join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )

    def window_topn() -> DataFrame:
        # rank-per-group before the join: window + join-order interplay
        from pyspark.sql import Window as W

        w = W.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"), "l_linenumber")
        top = t("lineitem").withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
        return (
            top.join(t("part"), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(F.sum("l_extendedprice").alias("top_price"))
        )

    def outer_null_seg() -> DataFrame:
        # DSB-ish left outer join with null-segment accounting: outer joins
        # constrain the planner (no semi-join conversion, build-side rules)
        return (
            t("customer")
            .join(t("orders"), F.col("c_custkey") == F.col("o_custkey"), "left")
            .groupBy("c_mktsegment")
            .agg(
                F.count("o_orderkey").alias("n_orders"),
                F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                    "never_ordered"
                ),
            )
        )

    def docs_filter_join() -> DataFrame:
        # training-pipeline shape: filtered corpus joined to its embeddings
        # (doc_id == vec_id in the fixtures), aggregated per lang/label
        d = t("documents").filter(F.col("n_chars") > 200)
        return (
            d.join(t("embeddings"), F.col("doc_id") == F.col("vec_id"))
            .groupBy("lang", "label")
            .agg(F.count("*").alias("n"), F.avg("n_chars").alias("avg_chars"))
        )

    return {
        "star_5way": star_5way,
        "chain_supplier": chain_supplier,
        "selective_filter_join": selective_filter_join,
        "semi_anti_mix": semi_anti_mix,
        "theta_window": theta_window,
        "agg_rollup": agg_rollup,
        "fact_fact": fact_fact,
        "skewed_dim": skewed_dim,
        "union_branches": union_branches,
        "window_topn": window_topn,
        "outer_null_seg": outer_null_seg,
        "docs_filter_join": docs_filter_join,
    }


def manifest_workload(
    spark: SparkSession, sf_dir: str, names: list[str]
) -> dict[str, Callable[[], DataFrame]]:
    """Adapt manifest queries (relational/pipeline registry entries) into
    live steering targets: any oracle-checked query can be explored across
    the HintSet space, not just the synthetic shapes above."""
    from limeqo_spark.manifest import REGISTRY

    def closure(name: str) -> Callable[[], DataFrame]:
        spec = REGISTRY[name]
        return lambda: spec.builder(spark, sf_dir)

    return {name: closure(name) for name in names}
