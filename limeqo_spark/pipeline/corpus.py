"""Shared planted-duplicate corpus for the dedup operators.

The fixture documents are all-distinct (500 unique texts), so near-dup
operators need planted pairs. The plant is *deterministic and expressible in
both engines*: every doc with doc_id < 30 gets a clone with doc_id+10000 and
one appended token — near-identical text (token-shingle Jaccard well above
0.6) so (doc_id, doc_id+10000) are the ground-truth duplicate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import table

PLANT_N = 30
PLANT_OFFSET = 10_000
PLANT_SUFFIX = " zzzdup"

#: planted EMBEDDING clones (the vector analog of the document plant):
#: every vec_id < EMB_PLANT_N gets an exact copy at vec_id + EMB_PLANT_OFFSET
#: — ONE definition for dedup_embedding_cosine and dedup_semantic_clusters
#: (builders and oracles), review r8
EMB_PLANT_N = 20
EMB_PLANT_OFFSET = 10_000

#: DuckDB view of the same corpus (oracle side of the contract)
CORPUS_SQL = f"""
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET} AS doc_id, text || '{PLANT_SUFFIX}' AS text, lang
  FROM documents WHERE doc_id < {PLANT_N}
"""


def planted_embeddings(spark: SparkSession, sf_dir: str, cast: str | None = None) -> DataFrame:
    """Embedding corpus + planted exact clones; ``cast`` optionally casts
    the vector column (e.g. "array<double>")."""
    base = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if cast:
        base = base.select("vec_id", F.col("embedding").cast(cast).alias("embedding"))
    clones = base.filter(F.col("vec_id") < EMB_PLANT_N).select(
        (F.col("vec_id") + EMB_PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    return base.unionByName(clones)


def planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dup = (
        d.filter(F.col("doc_id") < PLANT_N)
        .select(
            (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(PLANT_SUFFIX)).alias("text"),
            "lang",
        )
    )
    # The fixture parquet is 1-2 splits, so every downstream token
    # explode + signature projection would run near-serial (measured: the
    # SimHash vote stage ran on 2 of 32 cores). Spreading the small doc
    # rows across the cluster's parallelism is a cheap shuffle that a real
    # 100 TB corpus gets for free from its thousands of input splits.
    return d.unionByName(dup).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def spread(df: DataFrame) -> DataFrame:
    """Repartition a small-split source to the session parallelism BEFORE
    per-row-heavy work (tokenize/explode/md5) — the planted_corpus idiom
    (opt r11, applied to the text battery): the fixture parquet reads as
    1-2 splits, so an explode straight off the scan runs its token work
    near-serial while 30 cores idle. Keying the exchange on doc_id also
    lets every downstream per-document aggregate/distinct reuse the
    partitioning instead of shuffling the much larger exploded frame. A
    real 100 TB corpus arrives in thousands of splits, where the same
    hash exchange is what the per-doc aggregate would have paid anyway —
    here it carries 5k doc rows instead of 1M+ shingle rows."""
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )


def shingle_transform_sql(arr: str, n: int, item: str | None = None) -> str:
    """Guarded n-gram transform over a token-array column: yields an empty
    array when the document has fewer than ``n`` tokens.

    The naive ``sequence(0, size(arr) - n)`` produces a *descending*
    ``[0, -1, ...]`` when ``size(arr) < n`` (Spark defaults the step to -1
    when start > stop), and ``slice(arr, 0, n)`` then throws
    INVALID_PARAMETER_VALUE at runtime — the CASE makes the empty case
    explicit so short documents contribute no shingles (matching the
    DuckDB ``generate_series(1, greatest(len - n, 0))`` oracle, which is
    empty for start > stop).
    """
    item = item or f"concat_ws(' ', slice({arr}, i + 1, {n}))"
    return (
        f"CASE WHEN size({arr}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({arr}) - {n}), i -> {item}) END"
    )


def token_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-token shingles of whitespace tokens.

    Built-in higher-order functions only (transform over sequence + slice):
    stays in whole-stage codegen, no Python in the hot path.
    """
    toks = df.withColumn("toks", F.split(F.col("text"), " "))
    sh = toks.select(
        "doc_id",
        F.explode(F.expr(shingle_transform_sql("toks", n))).alias("shingle"),
    )
    return sh.distinct()
