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
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table_name)


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
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
