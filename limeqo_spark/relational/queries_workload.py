"""Workload-matrix operators (SURVEY §2A A6-A18) under the oracle gate.

The strategy loop exercises these same functions (limeqo_spark.workload) on
reference matrices; here they run over a deterministic long-form projection
of the orders fixture — (query_idx = o_custkey, hint_id = o_orderkey % 7,
latency = o_totalprice, observed = o_orderkey % 3 > 0) — so every operator
also gets a cross-engine value check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark import workload as wlops
from limeqo_spark.io import table
from limeqo_spark.relational.registry import query, raise_on_failed_gates

#: the long-form projection, DuckDB side
LONG_SQL = """
  SELECT o_custkey AS query_idx,
         CAST(o_orderkey % 7 AS INT) AS hint_id,
         o_totalprice AS latency,
         (o_orderkey % 3) > 0 AS observed
  FROM orders
"""


def long_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").alias("query_idx"),
        (F.col("o_orderkey") % 7).cast("int").alias("hint_id"),
        F.col("o_totalprice").alias("latency"),
        ((F.col("o_orderkey") % 3) > 0).alias("observed"),
    )


@query(
    "limeqo_wl_min_observed",
    oracle=f"""
    WITH long AS ({LONG_SQL})
    SELECT query_idx, MIN(latency) AS min_observed
    FROM long WHERE observed GROUP BY query_idx ORDER BY query_idx
    """,
)
def wl_min_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: per-query best observed latency (NULL-safe, no 0/inf sentinel)."""
    return wlops.min_observed(long_df(spark, sf_dir)).orderBy("query_idx")


@query(
    "limeqo_wl_argmin_per_query",
    oracle=f"""
    WITH long AS ({LONG_SQL}),
    ranked AS (
      SELECT query_idx, hint_id, latency,
             ROW_NUMBER() OVER (PARTITION BY query_idx ORDER BY latency, hint_id) AS rn
      FROM long WHERE observed
    )
    SELECT query_idx, hint_id, latency AS best_latency
    FROM ranked WHERE rn = 1 ORDER BY query_idx
    """,
)
def wl_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: per-query argmin hint, deterministically tie-broken."""
    return wlops.argmin_per_query(
        long_df(spark, sf_dir).filter("observed")
    ).orderBy("query_idx")


@query(
    "limeqo_wl_default_vs_opt",
    oracle=f"""
    WITH long AS ({LONG_SQL})
    SELECT
      ROUND(CAST((SELECT SUM(CAST(latency AS DECIMAL(18,2))) FROM long WHERE hint_id = 0) AS DOUBLE), 2) AS default_time,
      ROUND(CAST((SELECT SUM(CAST(m AS DECIMAL(18,2))) FROM (
         SELECT MIN(latency) AS m FROM long GROUP BY query_idx) t) AS DOUBLE), 2) AS opt_time
    """,
)
def wl_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A13: default-column total vs oracle (per-query min) total."""
    df = long_df(spark, sf_dir)
    default = df.filter("hint_id = 0").agg(
        F.round(F.sum(F.col("latency").cast("decimal(18,2)")), 2).cast("double").alias(
            "default_time"
        )
    )
    opt = (
        df.groupBy("query_idx")
        .agg(F.min("latency").alias("m"))
        .agg(
            F.round(F.sum(F.col("m").cast("decimal(18,2)")), 2).cast("double").alias(
                "opt_time"
            )
        )
    )
    return default.crossJoin(opt)


@query(
    "limeqo_wl_percentiles",
    oracle=f"""
    WITH long AS ({LONG_SQL}),
    mo AS (SELECT query_idx, MIN(latency) AS min_observed FROM long WHERE observed GROUP BY query_idx)
    SELECT ROUND(quantile_cont(min_observed, 0.5), 4) AS p50,
           ROUND(quantile_cont(min_observed, 0.9), 4) AS p90,
           ROUND(quantile_cont(min_observed, 0.95), 4) AS p95,
           ROUND(quantile_cont(min_observed, 0.99), 4) AS p99
    FROM mo
    """,
)
def wl_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: p50-p99 of per-query best-observed latencies."""
    row = wlops.workload_percentiles(long_df(spark, sf_dir))
    return row.select(*[F.round(c, 4).alias(c) for c in ("p50", "p90", "p95", "p99")])


@query(
    "limeqo_wl_topk_improvement",
    oracle=f"""
    WITH long AS ({LONG_SQL}),
    mo AS (SELECT query_idx, MIN(latency) AS min_observed FROM long WHERE observed GROUP BY query_idx),
    cand AS (
      SELECT l.query_idx, l.hint_id,
             (mo.min_observed - l.latency) / l.latency AS improve
      FROM long l JOIN mo ON mo.query_idx = l.query_idx
      WHERE NOT l.observed
    )
    SELECT query_idx, hint_id, ROUND(improve, 4) AS improve
    -- ORDER BY the qualified RAW column: a bare `improve` resolves to the
    -- rounded output alias in DuckDB, while the Spark side selects the
    -- top-20 by the unrounded value — 4dp collisions would pick/order
    -- different rows (review r8)
    FROM cand ORDER BY cand.improve DESC, query_idx, hint_id LIMIT 20
    """,
)
def wl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: rank unobserved cells by relative improvement, top-k with a
    deterministic tie-break (simulation's "select" step as one plan)."""
    df = long_df(spark, sf_dir)
    mo = wlops.min_observed(df)
    cand = (
        df.filter(~F.col("observed"))
        .join(mo, "query_idx")
        .withColumn("improve", (F.col("min_observed") - F.col("latency")) / F.col("latency"))
    )
    top = wlops.topk_by_improvement(cand, 20)
    return top.select("query_idx", "hint_id", F.round("improve", 4).alias("improve"))


@query(
    "limeqo_wl_equivalence_groups",
    oracle=f"""
    WITH long AS ({LONG_SQL}),
    g AS (
      SELECT query_idx, hint_id,
             DENSE_RANK() OVER (PARTITION BY query_idx ORDER BY latency) AS equiv_group
      FROM long WHERE observed
    )
    SELECT query_idx, CAST(MAX(equiv_group) AS BIGINT) AS n_groups, COUNT(*) AS n_cells
    FROM g GROUP BY query_idx ORDER BY query_idx
    """,
)
def wl_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18: plan-equivalence grouping (value-equality variant) — group count
    per query (equal latencies share a group)."""
    g = wlops.equivalence_groups_from_values(long_df(spark, sf_dir))
    return (
        g.groupBy("query_idx")
        .agg(
            F.max("equiv_group").cast("bigint").alias("n_groups"),
            F.count("*").alias("n_cells"),
        )
        .orderBy("query_idx")
    )


@query(
    "limeqo_wl_roundtrip_long",
    oracle=f"""
    WITH long AS ({LONG_SQL}),
    obs AS (
      SELECT lpad(CAST(query_idx AS VARCHAR), 8, '0') AS query_id,
             hint_id, MIN(latency) AS latency
      FROM long WHERE observed GROUP BY 1, 2
    ),
    queries AS (
      SELECT query_id, CAST(DENSE_RANK() OVER (ORDER BY query_id) - 1 AS BIGINT) AS query_idx
      FROM (SELECT DISTINCT query_id FROM obs) q
    ),
    hints AS (
      SELECT UNNEST(generate_series(0, (SELECT MAX(hint_id) FROM obs))) AS hint_id
    )
    SELECT q.query_idx, q.query_id, CAST(h.hint_id AS INT) AS hint_id,
           o.latency, o.latency IS NOT NULL AS observed
    FROM queries q CROSS JOIN hints h
    LEFT JOIN obs o ON o.query_id = q.query_id AND o.hint_id = h.hint_id
    ORDER BY q.query_idx, h.hint_id
    """,
)
def wl_roundtrip_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A30 state surface round-trip, driver-hashed (VERDICT r8 #6):
    a live observations log (observed cells only) rebuilds into the dense
    driver Workload via ``Workload.from_long_df`` — NULL-latency
    unobserved cells, gap hints reindexed, lexicographic query order —
    and projects back out through ``to_long_df``. The oracle reconstructs
    the same dense grid relationally, so the pivot/reindex/mask mechanics
    the sim loop and live steering sessions rely on get a cross-engine
    value check, not just unit tests. query_id is zero-padded so the
    pandas lexicographic index sort equals numeric order on both sides."""
    from limeqo_spark.workload import Workload

    obs = (
        long_df(spark, sf_dir)
        .filter("observed")
        .select(
            F.lpad(F.col("query_idx").cast("string"), 8, "0").alias("query_id"),
            "hint_id",
            "latency",
        )
    )
    back = Workload.from_long_df(obs).to_long_df(spark)
    return back.select(
        "query_idx", "query_id", F.col("hint_id").cast("int").alias("hint_id"),
        "latency", "observed"
    ).orderBy("query_idx", "hint_id")


@query("limeqo_mllib_complete_agree", oracle=None, check="prop")
def wl_mllib_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19's DISTRIBUTED completion path (MLlib ALS, `complete.
    mllib_als_complete`) exercised end-to-end against the driver-numpy
    solver the sims run on: both complete the same seeded low-rank workload
    and the gate reports the overlap of their top-k exploration selections
    (`rank_cells_by_improvement`, LimeQO's selection core). One row:
    (k, overlap, bar, ok).

    Deliberately runs on a SEEDED SYNTHETIC workload, not the sf tables —
    the gate checks MODEL agreement between two solvers of the same
    objective, which must be deterministic and scale-independent (measured
    0.667 at every MLlib seed tried; bar 0.5 leaves margin for partitioning
    -dependent ALS numerics). The distributed solver never materializes a
    matrix: observations stay a DataFrame, factors stay distributed, and
    predictions come back as a DataFrame join (complete.py:160-205) — the
    shape that still works when the workload matrix has millions of rows.
    """
    import numpy as np

    from limeqo_spark.complete import complete_log_space, mllib_als_complete
    from limeqo_spark.strategies import rank_cells_by_improvement
    from limeqo_spark.workload import Workload

    k = 24
    wl = Workload.synthetic_low_rank(n_rows=120, n_cols=16, rank=3, seed=11, density=0.25)
    mo = np.where(wl.mask > 0, wl.matrix, np.inf).min(axis=1)
    driver_pred = complete_log_space(wl.matrix, wl.mask, None, rank=5, iters=50, lam=0.2, seed=0).completed
    pp = mllib_als_complete(
        spark, wl.to_long_df(spark), rank=5, iters=15, lam=0.2, seed=0
    ).toPandas()
    pred = np.full(wl.matrix.shape, np.inf)
    v = pp["pred_latency"].to_numpy()
    fin = np.isfinite(v)
    pred[pp["query_idx"].to_numpy()[fin], pp["hint_id"].to_numpy()[fin]] = v[fin]
    a = set(rank_cells_by_improvement(driver_pred, wl.mask, mo, k))
    b = set(rank_cells_by_improvement(pred, wl.mask, mo, k))
    overlap = len(a & b) / max(len(a), 1)
    bar = 0.5
    out = spark.createDataFrame(
        [(k, round(overlap, 4), bar, overlap >= bar)],
        "k int, overlap double, bar double, ok boolean",
    )
    # raise on a failed bar so the driver's rows-only PROP check records a
    # non-null err instead of an unchanged 1-row count (review r8 — the
    # ann_recall_gate / scale_pruning_gate pattern; this entry previously
    # returned its ok=false row silently)
    return raise_on_failed_gates(out, "limeqo_mllib_complete_agree")
