"""Training-data mixing: deterministic per-language quota sampling.

The curation step after filtering/dedup — composing a training mix with
fixed per-source quotas (e.g. 60% en / 30% es / 10% zh of a document
budget). Sampling is md5-rank based, so it is exactly reproducible across
engines AND across runs: rank documents inside each language by
md5(doc_id), take the quota smallest. No RNG, no engine-specific sampler.

Scale note (100 TB): the per-language window here shuffles by language —
a handful of huge partitions. At scale you replace the exact window with a
hash-threshold cut: pick t_lang as the quota-quantile of the md5 space
(percentile_approx or a fixed-width histogram over the first 8 hash
bytes), then keep rows with hash < t_lang — one scan, no window, no skew;
the quota lands within the approx-quantile error. The exact window variant
below is the oracle-checkable fixture form of the same operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query

#: per-language share of the sampled budget (a typical mixing recipe:
#: heavier weight on the highest-resource source)
MIX_QUOTAS: dict[str, int] = {"en": 60, "es": 30, "zh": 10}


def _quota_case() -> str:
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_QUOTAS.items())
        + " ELSE 0 END"
    )


@query(
    "corpus_mix_quota_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= ({_quota_case()})
    ORDER BY lang, rk
    """,
)
def corpus_mix_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixing sample: md5(doc_id)-ranked top-quota documents
    per language. Hash ranking is an unbiased, seedless, engine-portable
    shuffle of each stratum, so the identical SQL verifies the exact
    selected doc_ids in DuckDB — the property q63's Bernoulli sampler (a
    JVM RNG) can only be prop-checked for."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    quota = F.expr(_quota_case())
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= quota)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )
