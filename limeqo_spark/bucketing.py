"""Bucketing utilities: pre-shuffle fact tables once so repeated joins and
aggregations on the bucket key run with NO exchange (SURVEY §4.4 / the
pyspark guide's co-location rule).

At 100 TB this is the difference between shuffling the fact table per query
and shuffling it once at ingest: `write_bucketed` materializes a table
hash-bucketed (and sorted) by the join key; Catalyst then plans bucket-local
SortMergeJoins / aggregations over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    _drop_orphaned_location(df.sparkSession, table_name)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table_name)


def _drop_orphaned_location(spark: SparkSession, table_name: str) -> None:
    """The default in-memory catalog forgets managed tables between sessions
    but their warehouse directories persist (e.g. after a killed run);
    saveAsTable then refuses the location. If the table is NOT registered
    but its directory exists, remove the orphaned directory."""
    import shutil
    from urllib.parse import urlparse

    if spark.catalog.tableExists(table_name):
        return
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{wh.path or wh.geturl()}/{table_name.lower()}", ignore_errors=True)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key: with matching bucket specs
    the planner emits a SortMergeJoin with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchanges_in_executed_plan(df: DataFrame) -> int:
    """Count shuffle exchanges in the final (post-AQE) executed plan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an adaptive plan string repeats the tree under "== Initial Plan ==";
    # count only the final (executed) section
    plan = plan.split("== Initial Plan ==")[0]
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )


def ensure_bucketed_pair(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> tuple[str, str]:
    """Materialize ``lineitem`` and ``orders`` hash-bucketed (and sorted) by
    order key — the ingest-time layout a 100 TB lake would use so every
    downstream orderkey join/agg runs without re-shuffling the fact table.
    Idempotent per (warehouse, sf_dir); returns the two table names.

    The bucketed copies carry only the columns the colocated surface needs:
    bucketing is a physical-layout decision, and at scale you bucket the
    curated fact projection, not every raw column.
    """
    from limeqo_spark.io import table

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
    li_name, o_name = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    if not spark.catalog.tableExists(li_name):
        write_bucketed(
            table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
            ),
            li_name,
            ["l_orderkey"],
            n_buckets,
        )
    if not spark.catalog.tableExists(o_name):
        write_bucketed(
            table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
            ),
            o_name,
            ["o_orderkey"],
            n_buckets,
        )
    return li_name, o_name
