"""Text-analysis operators (SURVEY §2B B40 + north star): language-ID,
quality scoring, BPE-ish token counting, document fingerprinting. All
built-in string/array functions — JVM-side, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query

#: deterministic marker lexicons for the n-gram language-ID heuristic. The
#: fixture corpus is synthetic (same vocabulary across langs), so this
#: demonstrates the operator's plumbing with a verifiable oracle rather
#: than real linguistics; swap lexicons for real stopword lists in prod.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow", "value"),
    "es": ("data", "query", "stream", "filter"),
    "zh": ("window", "merge", "batch", "join"),
}


def _in_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


@query(
    "text_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, UNNEST(string_split(LOWER(text), ' ')) AS tok
      FROM documents
    ),
    scores AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang,
             CAST(SUM(CASE WHEN tok IN ({_in_list(LANG_MARKERS['en'])}) THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
             CAST(SUM(CASE WHEN tok IN ({_in_list(LANG_MARKERS['es'])}) THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
             CAST(SUM(CASE WHEN tok IN ({_in_list(LANG_MARKERS['zh'])}) THEN 1 ELSE 0 END) AS BIGINT) AS s_zh
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS pred_lang,
           s_en, s_es, s_zh
    FROM scores ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via marker-token scoring: tokenize, score per lexicon,
    argmax with a fixed tie order (en > es > zh)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    scores = toks.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        *[
            F.sum(F.when(F.col("tok").isin(*vals), 1).otherwise(0))
            .cast("bigint")
            .alias(f"s_{lang}")
            for lang, vals in LANG_MARKERS.items()
        ],
    )
    pred = (
        F.when((F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_zh")), "en")
        .when(F.col("s_es") >= F.col("s_zh"), "es")
        .otherwise("zh")
    )
    return scores.select(
        "doc_id", pred.alias("pred_lang"), "s_en", "s_es", "s_zh"
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_spaces,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
      FROM documents
    )
    SELECT doc_id, n_chars_m, n_tokens,
           ROUND(CAST(n_chars_m - n_spaces AS DOUBLE) / n_tokens, 4) AS avg_tok_len,
           ROUND(CAST(n_digits AS DOUBLE) / n_chars_m, 4) AS digit_ratio,
           ROUND(LEAST(CAST(n_tokens AS DOUBLE) / 100, 1.0)
                 * (1 - CAST(n_digits AS DOUBLE) / n_chars_m), 4) AS quality
    FROM feats ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/token/digit features -> bounded [0,1] score
    (long-enough docs without digit noise score high)."""
    d = table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_m"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("bigint")
        .alias("n_spaces"),
        F.regexp_count("text", F.lit("[0-9]")).cast("bigint").alias("n_digits"),
    )
    return feats.select(
        "doc_id",
        "n_chars_m",
        "n_tokens",
        F.round((F.col("n_chars_m") - F.col("n_spaces")).cast("double") / F.col("n_tokens"), 4).alias(
            "avg_tok_len"
        ),
        F.round(F.col("n_digits").cast("double") / F.col("n_chars_m"), 4).alias("digit_ratio"),
        F.round(
            F.least(F.col("n_tokens").cast("double") / 100, F.lit(1.0))
            * (1 - F.col("n_digits").cast("double") / F.col("n_chars_m")),
            4,
        ).alias("quality"),
    ).orderBy("doc_id")


@query(
    "text_token_count_bpeish",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(LOWER(text), '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS BIGINT) AS n_bpeish,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letter runs / single digits / other symbols)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.sum(F.regexp_count(F.lower("text"), F.lit("[a-z]+|[0-9]|[^a-z0-9 ]")))
            .cast("bigint")
            .alias("n_bpeish"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_ws"),
        )
        .orderBy("lang")
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, MD5(array_to_string(t[i : i + 2], ' ')) AS h
      FROM (
        SELECT doc_id, t, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS i
        FROM toks
      ) z
    )
    SELECT doc_id, MIN(h) AS fingerprint, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_shingles
    FROM sh GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash (md5, engine-portable) over 3-token
    shingles — a 1-permutation MinHash signature usable as a dedup key."""
    d = table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("t"))
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(t) - 3, -1)),"
                " i -> md5(concat_ws(' ', slice(t, i + 1, 3))))"
            )
        ).alias("h"),
    )
    return (
        sh.groupBy("doc_id")
        .agg(
            F.min("h").alias("fingerprint"),
            F.countDistinct("h").cast("bigint").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )
