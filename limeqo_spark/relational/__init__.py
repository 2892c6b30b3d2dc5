"""Relational query surface (SURVEY.md §2B, Q01..Q44 manifest).

Importing this package populates :data:`limeqo_spark.relational.registry.REGISTRY`
with every declared query. Each entry carries the Spark builder (DataFrame
API) and, where the semantics are SQL-expressible, the DuckDB oracle SQL the
driver hash-compares against.
"""

from limeqo_spark.relational import (  # noqa: F401  (import for registration side-effect)
    queries_agg_window,
    queries_events,
    queries_functions,
    queries_gates,
    queries_profile,
    queries_pysource,
    queries_scale,
    queries_scan_join,
    queries_tpch,
    queries_udf,
    queries_workload,
)
from limeqo_spark.relational.registry import REGISTRY, QuerySpec  # noqa: F401
