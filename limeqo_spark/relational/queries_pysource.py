"""Custom Python data source (Spark 4 DataSource API): the engine's
source surface beyond the built-in formats (SURVEY B1–B4 cover parquet/
CSV/JSON/ORC/XML/text/binaryFile; this row covers *user-defined* sources —
the escape hatch for feeds Spark has no connector for: internal metric
stores, bespoke binary logs, simulator outputs).

The demonstration source generates the reference's long-form workload
matrix shape — ``(query_id, hint_id, latency_ms)``, LimeQO's core input
(reference ``src/data/dataset.py:24-31`` reads it from CSV+NPY) — with a
deterministic md5-derived pseudo-latency, partitioned by query range so
the read is parallel. Determinism makes the source cross-engine
verifiable: the DuckDB oracle regenerates the identical rows from
``generate_series`` + the same md5 arithmetic, so a full HASH check runs
over a source that never touches disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.relational.registry import query

#: synthetic workload-matrix geometry (queries x hints, reference width 49)
WM_QUERIES, WM_HINTS, WM_PARTS = 200, 49, 8


def _register_source(spark: SparkSession) -> None:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _WorkloadReader(DataSourceReader):
        def __init__(self, options):
            self.n_q = int(options.get("queries", WM_QUERIES))
            self.n_h = int(options.get("hints", WM_HINTS))
            self.n_p = int(options.get("partitions", WM_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_p)]

        def read(self, part):
            import hashlib

            # query-range partitioning: executor-side generation, no
            # driver materialization, no shuffle to parallelize
            for q in range(part.value, self.n_q, self.n_p):
                for h in range(self.n_h):
                    d = hashlib.md5(f"{q}:{h}".encode()).hexdigest()
                    yield (q, h, int(d[:8], 16) % 10_000)

    class WorkloadMatrixSource(DataSource):
        """format('workload_matrix'): synthetic (query_id, hint_id,
        latency_ms) rows, md5-deterministic."""

        @classmethod
        def name(cls):
            return "workload_matrix"

        def schema(self):
            return "query_id bigint, hint_id bigint, latency_ms bigint"

        def reader(self, schema):
            return _WorkloadReader(self.options)

    spark.dataSource.register(WorkloadMatrixSource)


_Q103_ORACLE = f"""
WITH cells AS (
  SELECT q.q AS query_id, h.h AS hint_id,
         ('0x' || substr(md5(q.q || ':' || h.h), 1, 8))::BIGINT % 10000
           AS latency_ms
  FROM (SELECT UNNEST(generate_series(0, {WM_QUERIES - 1})) AS q) q,
       (SELECT UNNEST(generate_series(0, {WM_HINTS - 1})) AS h) h
),
-- deterministic argmin via an integer packed key (hint_id < 100):
-- min(latency*100 + hint) breaks latency ties on the lowest hint id
best AS (
  SELECT query_id, MIN(latency_ms * 100 + hint_id) AS packed
  FROM cells GROUP BY query_id
)
SELECT query_id, CAST(packed % 100 AS BIGINT) AS best_hint,
       CAST(packed // 100 AS BIGINT) AS best_latency
FROM best
ORDER BY query_id
"""


@query("q103_python_datasource", oracle=_Q103_ORACLE)
def q103_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python data source in parallel partitions and run
    the reference's per-query argmin (A11/A12: best observed hint per
    query, ties to the lowest hint id) over it. ``sf_dir`` is unused —
    the source is generated, which is the point: the oracle regenerates
    the identical cells arithmetically in DuckDB, so a user-defined
    source participates in the same HASH gate as every file-backed one.

    Scale: the DataSource API streams Arrow batches from Python workers
    per InputPartition — generation cost is spread across executors, and
    the downstream argmin is a plain partial-aggregatable groupBy (no
    window; the packed integer key gives the tie-broken argmin in one
    MIN pass).
    """
    _register_source(spark)
    cells = spark.read.format("workload_matrix").load()
    # deterministic argmin via the packed integer key (same as the oracle):
    # one partial-aggregatable MIN, ties to the lowest hint id
    return (
        cells.groupBy("query_id")
        .agg(F.min(F.col("latency_ms") * 100 + F.col("hint_id")).alias("packed"))
        .select(
            "query_id",
            (F.col("packed") % 100).cast("bigint").alias("best_hint"),
            F.expr("packed DIV 100").cast("bigint").alias("best_latency"),
        )
        .orderBy("query_id")
    )
