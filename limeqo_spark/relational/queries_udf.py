"""UDF surfaces — SURVEY §2B B41-B43 (Q41-Q43).

These exist to prove the Python extension points (scalar UDF, grouped
pandas, UDTF) against SQL-expressible oracles. Production operators prefer
built-ins; these paths host things Spark can't express (censored ALS, TCNN
inference, plan-tree flattening — SURVEY A20/A22/A27).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query


@query(
    "q41_scalar_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(6,2))
                      * CAST(1 + l_tax AS DECIMAL(6,2)), 4) AS DOUBLE) AS charge
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41 vectorized pandas UDF computing Q05's charge expression with exact
    integer-cents arithmetic, matching the DECIMAL oracle bit-for-bit."""

    @F.pandas_udf(T.DoubleType())
    def charge(p: pd.Series, d: pd.Series, t: pd.Series) -> pd.Series:
        import numpy as np

        cents = np.rint(p.to_numpy() * 100).astype("int64")
        d100 = np.rint((1 - d.to_numpy()) * 100).astype("int64")
        t100 = np.rint((1 + t.to_numpy()) * 100).astype("int64")
        micro = cents * d100 * t100  # units of 1e-6
        q4 = (micro + 50) // 100  # HALF_UP to 4 decimal places
        return pd.Series(q4 / 1e4)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 4).alias("charge"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q42_grouped_pandas",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42 applyInPandas per-group aggregate == builtin AVG (to 4dp).

    The pandas side sums via exact integer cents so the result is
    partition-order independent, mirroring the DECIMAL discipline.
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        mean = (cents.sum() / 100.0) / len(pdf)
        # round the TRUE binary value half-away-from-zero (what DuckDB's
        # ROUND(double, 4) does) — python round() is half-even and would
        # diverge at exact binary ties like cents/1600 (review r8)
        rounded = float(
            Decimal(mean).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "n": [len(pdf)],
                "mean_price": [rounded],
            }
        )

    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .applyInPandas(per_group, "o_orderstatus string, n bigint, mean_price double")
        .orderBy("o_orderstatus")
    )


def synthetic_plan_json(nationkey: int) -> str:
    """Deterministic mini plan-tree per nation row (the Q43 fixture).

    Even keys get Join(Scan_a, Join(Scan_b, Scan_c)); odd keys get
    Join(Scan_a, Scan_b) — exercising n-ary flattening at two depths.
    """
    scan = lambda nm: {"node": nm, "children": []}  # noqa: E731
    if nationkey % 2 == 0:
        tree = {
            "node": "Join",
            "children": [scan("Scan_a"), {"node": "Join", "children": [scan("Scan_b"), scan("Scan_c")]}],
        }
    else:
        tree = {"node": "Join", "children": [scan("Scan_a"), scan("Scan_b")]}
    return json.dumps(tree)


@query(
    "q43_udtf_flatten",
    oracle="""
    WITH per_row AS (
      SELECT n_nationkey, CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END AS even
      FROM nation
    ), expected AS (
      SELECT 'Join' AS node_type, 0 AS depth, COUNT(*) AS n FROM per_row
      UNION ALL SELECT 'Scan_a', 1, COUNT(*) FROM per_row
      UNION ALL SELECT 'Join', 1, CAST(SUM(even) AS BIGINT) FROM per_row
      UNION ALL SELECT 'Scan_b', 1, CAST(SUM(1 - even) AS BIGINT) FROM per_row
      UNION ALL SELECT 'Scan_b', 2, CAST(SUM(even) AS BIGINT) FROM per_row
      UNION ALL SELECT 'Scan_c', 2, CAST(SUM(even) AS BIGINT) FROM per_row
    )
    SELECT node_type, CAST(depth AS BIGINT) AS depth, n FROM expected WHERE n > 0
    ORDER BY node_type, depth
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43 UDTF: flatten a plan-JSON column into (node_type, depth) rows via
    mapInPandas (one input row -> many output rows), then count per type."""
    n = table(spark, sf_dir, "nation")
    make_plan = F.udf(synthetic_plan_json, T.StringType())
    plans = n.select(F.col("n_nationkey"), make_plan(F.col("n_nationkey")).alias("plan_json"))

    def flatten(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, int]] = []
            for pj in pdf["plan_json"]:
                stack = [(json.loads(pj), 0)]
                while stack:
                    node, depth = stack.pop()
                    rows.append((node["node"], depth))
                    for ch in node["children"]:
                        stack.append((ch, depth + 1))
            yield pd.DataFrame(rows, columns=["node_type", "depth"])

    flat = plans.mapInPandas(flatten, "node_type string, depth int")
    return (
        flat.groupBy("node_type", F.col("depth").cast("bigint").alias("depth"))
        .agg(F.count("*").alias("n"))
        .orderBy("node_type", "depth")
    )


@query(
    "q52_python_udtf_lateral",
    oracle="""
    WITH toks AS (SELECT p_partkey, string_split(p_name, ' ') AS ts FROM part),
    ex AS (
      SELECT p_partkey,
             CAST(generate_subscripts(ts, 1) - 1 AS INT) AS pos,
             UNNEST(ts) AS token
      FROM toks
    )
    -- the UDTF skips empty tokens (consecutive/leading spaces); the
    -- oracle must too, or a double-spaced name diverges (review r8; the
    -- q40 tok <> '' precedent)
    SELECT p_partkey, pos, token FROM ex WHERE token <> ''
    ORDER BY p_partkey, pos
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43 as a real Python UDTF (Spark 3.5+ ``@udtf``): one part name in,
    one row per token out, applied per input row via SQL LATERAL — the
    native table-function surface, complementing q43's mapInPandas route.
    Runs distributed: the UDTF evaluates on executors per partition."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split(" ")):
                if tok:
                    yield i, tok

    spark.udtf.register("limeqo_split_tokens", SplitTokens)
    table(spark, sf_dir, "part").createOrReplaceTempView("limeqo_q52_part")
    return spark.sql(
        """
        SELECT p.p_partkey, s.pos, s.token
        FROM limeqo_q52_part p, LATERAL limeqo_split_tokens(p.p_name) s
        ORDER BY p.p_partkey, s.pos
        """
    )


@query(
    "q53_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS ks,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
    FROM events WHERE props IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4.x): parse events.props into a
    VARIANT column once, then typed ``variant_get`` extractions feed the
    aggregate — the open-schema JSON lake pattern (vs q03's fixed
    from_json schema, which requires knowing the schema up front)."""
    ev = table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    v = ev.withColumn("v", F.parse_json("props"))
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).cast("bigint").alias("ks"),
            F.max(k).cast("bigint").alias("k_max"),
            F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_hot"),
        )
        .orderBy("event_type")
    )
