"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query; ``queries()`` /
``oracle_sql()`` expose the full SURVEY.md §2 manifest implemented in
``limeqo_spark.relational`` (+ pipeline/streaming modules as they land).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from limeqo_spark.manifest import REGISTRY  # populates on import

    return REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from limeqo_spark.relational.queries_scan_join import q15

    return q15(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in sorted(_registry().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checked query."""
    return {
        name: spec.oracle
        for name, spec in sorted(_registry().items())
        if spec.oracle is not None
    }
