"""Corpus curation tail: hash split, temperature resampling, shuffle-shard
layout, dataset stats card.

The last mile of a training-data pipeline after filter/dedup/mix: carve
train/holdout sets, rebalance languages, lay the corpus out in shuffled
shards for the trainer, and publish the dataset card. Every operator is
seedless-deterministic via md5 (the repo's portable cross-engine idiom:
Spark ``conv(substr(md5(x),1,k),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,k))::BIGINT``), so membership — not just counts —
hash-verifies against DuckDB.

Scale notes are inline per operator; none of them needs a global sort or a
driver collect. Reference tie-in: the reference has no corpus layer (its
1,214 LoC are the steering algorithm, src/data/dataset.py loads matrices);
these are north-star LLM-pipeline operators per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query

#: split fractions in percent: 80 train / 10 val / 10 test
SPLIT_TRAIN, SPLIT_VAL = 80, 90


def md5_bucket(col, buckets: int = 100):
    """Deterministic [0, buckets) bucket of a key column via the portable
    md5-prefix idiom — THE split/bucketing primitive shared by
    corpus_split_train_holdout, pipeline_e2e_curate, and
    text_quality_classifier (change it here, the oracles' matching
    ('0x'||substr(md5(..),1,8))::BIGINT %% form, and nowhere else)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


@query(
    "corpus_split_train_holdout",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train'
                WHEN bucket < {SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split,
           doc_id, lang
    FROM b ORDER BY split, doc_id
    """,
)
def corpus_split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by md5 bucket of ``doc_id`` —
    the standard leakage-safe split (membership is a pure function of the
    key, so re-runs, backfills, and other engines agree row-for-row; no
    RNG, no split files to ship).

    Scale (100 TB): a stateless per-row projection — no shuffle, no
    window; the split column composes with partitioned writes
    (``partitionBy('split')``) so each set lands in its own prefix."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = md5_bucket(F.col("doc_id"))
    return (
        d.withColumn(
            "split",
            F.when(bucket < SPLIT_TRAIN, "train")
            .when(bucket < SPLIT_VAL, "val")
            .otherwise("test"),
        )
        .select("split", "doc_id", "lang")
        .orderBy("split", "doc_id")
    )


# temperature-sampling exponent is pinned at 0.5 (SQRT in both engines):
# square-root scaling, the common multilingual rebalancing recipe; a
# general n^alpha would need POWER(), whose cross-engine bit-identity is
# not guaranteed the way correctly-rounded SQRT is


def _sqrt_temperature_targets(counts: DataFrame, count_col: str) -> DataFrame:
    """(lang, count_col, target) with target = floor(total_n * w / total_w),
    w = floor(sqrt(count) * 1000). Weights are floored to integers first so
    every later step is exact engine-identical BIGINT arithmetic; the
    quotient uses the overflow-safe split identity
    ``floor(a*b/c) = (a DIV c)*b + ((a mod c)*b) DIV c`` (matching the
    oracles' ``//`` form), so no intermediate product exceeds
    ``max(total_n, total_w * max_w)`` — exact far past 100 TB corpus
    sizes. Shared by corpus_temperature_resample and pipeline_e2e_curate."""
    weights = counts.withColumn(
        "w", F.floor(F.sqrt(F.col(count_col).cast("double")) * 1000).cast("bigint")
    )
    totals = weights.agg(
        F.sum(count_col).alias("total_n"), F.sum("w").alias("total_w")
    )
    return weights.crossJoin(F.broadcast(totals)).select(
        "lang",
        count_col,
        F.expr(
            "(total_n DIV total_w) * w + ((total_n % total_w) * w) DIV total_w"
        ).alias("target"),
    )


@query(
    "corpus_temperature_resample",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    weights AS (
      -- FLOOR(sqrt(n)*1000) keeps the weight integral so every later step
      -- is exact integer arithmetic (engine-identical); sqrt is correctly
      -- rounded IEEE in both engines
      SELECT lang, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w
      FROM counts
    ),
    totals AS (
      SELECT (SELECT SUM(n) FROM counts) AS tn,
             (SELECT SUM(w) FROM weights) AS tw
    ),
    targets AS (
      -- floor(tn*w/tw) via the split identity (tn//tw)*w + ((tn%tw)*w)//tw
      -- so no product exceeds max(tn, tw*max_w); // is DuckDB integer
      -- division (plain / would promote to DOUBLE)
      SELECT lang, n,
             (tn // tw) * w + ((tn % tw) * w) // tw AS target
      FROM weights, totals
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, t.n, t.target,
             ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rk
      FROM documents d JOIN targets t USING (lang)
    )
    SELECT lang, doc_id,
           CAST(target // n + CASE WHEN rk <= target % n THEN 1 ELSE 0 END
                AS BIGINT) AS n_copies
    FROM ranked
    WHERE target // n + CASE WHEN rk <= target % n THEN 1 ELSE 0 END > 0
    ORDER BY lang, doc_id
    """,
)
def corpus_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling (alpha=0.5): per-language target counts
    proportional to ``n_lang^0.5`` at a constant total budget — the
    multilingual rebalancing that up-samples low-resource languages and
    down-samples the head. Emits per-document copy counts: every document
    gets ``floor(target/n)`` copies and the ``target mod n`` md5-smallest
    documents get one more, so the realized mix hits the integer target
    exactly and membership is engine-portable (weights are floored to
    integers first; everything after is exact BIGINT arithmetic).

    Scale (100 TB): language targets come from a 5-row aggregate
    (broadcast back); the only shuffle is the per-language rank window, and
    at scale the rank<=remainder cut is replaced by an md5-threshold on the
    hash value itself (remainder/n quantile), making the operator
    window-free — the same swap documented on corpus_mix_quota_sample."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    targets = _sqrt_temperature_targets(counts, "n")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    ranked = d.join(F.broadcast(targets), "lang").withColumn("rk", rk)
    n_copies = (
        F.expr("target DIV n")
        + F.when(F.col("rk") <= F.col("target") % F.col("n"), 1).otherwise(0)
    ).cast("bigint")
    return (
        ranked.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select("lang", "doc_id", "n_copies")
        .orderBy("lang", "doc_id")
    )


#: shard fan-out for the trainer-facing layout
N_SHARDS = 8


@query(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS hh
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, n_tokens, hh,
             ('0x' || substr(hh, 1, 4))::BIGINT * {N_SHARDS} // 65536 AS shard_id
      FROM h
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hh, doc_id))
             AS order_digest
    FROM sharded GROUP BY shard_id ORDER BY shard_id
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled shard layout — the trainer-facing write: documents land in
    ``N_SHARDS`` shards by md5 range (shard = first 16 hash bits scaled),
    read order inside a shard is the hash order. One md5 drives both, so
    the global document order is a deterministic permutation with no RNG
    and NO GLOBAL SORT: shard assignment is a stateless projection, and
    ordering is within-shard only. The emitted ``order_digest`` (md5 of
    the ordered doc_id list) makes the exact permutation — not just the
    shard sizes — cross-engine verifiable.

    Scale (100 TB): this is already the scale shape — hash-range sharding
    == ``repartitionByRange`` on the hash without sampling skew (md5 is
    uniform), then ``sortWithinPartitions(hh)`` + ``partitionBy(shard_id)``
    write; no stage sees more than one shard."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("hh"),
    )
    # conv() returns STRING — cast to bigint BEFORE the multiply (as
    # md5_bucket does) instead of riding the implicit string->double
    # coercion, which is exact only while the prefix stays 16-bit
    # (ADVICE round 3)
    shard = F.expr(
        f"CAST(conv(substring(hh, 1, 4), 16, 10) AS BIGINT) * {N_SHARDS} DIV 65536"
    ).cast("bigint")
    sharded = d.withColumn("shard_id", shard)
    ordered = F.expr("transform(array_sort(collect_list(struct(hh, doc_id))), s -> s.doc_id)")
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.md5(F.concat_ws(",", ordered)).alias("order_digest"),
        )
        .orderBy("shard_id")
    )


@query(
    "corpus_stats_card",
    oracle="""
    WITH t AS (
      SELECT lang, source, md5(text) AS th,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(CAST(n_tokens AS DOUBLE)), 4) AS avg_tokens,
           ROUND(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
           ROUND(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) - COUNT(DISTINCT th) AS BIGINT) AS exact_dup_docs
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def corpus_stats_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card rollup: per-language document/token counts, length
    percentiles, source diversity, and exact-duplicate count (docs minus
    distinct text digests) — the summary page published next to a corpus
    release.

    Scale (100 TB): one partial+final aggregate over (lang); the two exact
    COUNT(DISTINCT ...) rewrite to expand+two-phase agg on digests (never
    raw text — md5 first, as everywhere in the dedup layer); percentiles
    at scale switch to percentile_approx with a documented error bound."""
    d = table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.md5("text").alias("th"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg(F.col("n_tokens").cast("double")), 4).alias("avg_tokens"),
            F.round(F.percentile("n_tokens", F.lit(0.5)), 4).alias("p50_tokens"),
            F.round(F.percentile("n_tokens", F.lit(0.9)), 4).alias("p90_tokens"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            (F.count("*") - F.countDistinct("th")).cast("bigint").alias("exact_dup_docs"),
        )
        .orderBy("lang")
    )


#: e2e length-filter bounds (tokens)
E2E_MIN_TOK, E2E_MAX_TOK = 16, 512


@query(
    "pipeline_e2e_curate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    lenf AS (
      SELECT * FROM toks WHERE n BETWEEN {E2E_MIN_TOK} AND {E2E_MAX_TOK}
    ),
    keeper AS (
      SELECT MIN(doc_id) AS doc_id FROM lenf GROUP BY md5(text)
    ),
    deduped AS (
      SELECT l.doc_id, l.lang, l.n FROM lenf l JOIN keeper k USING (doc_id)
    ),
    train AS (
      SELECT * FROM deduped
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
            < {SPLIT_TRAIN}
    ),
    counts AS (SELECT lang, COUNT(*) AS cn FROM train GROUP BY lang),
    weights AS (
      SELECT lang, cn,
             CAST(FLOOR(SQRT(CAST(cn AS DOUBLE)) * 1000) AS BIGINT) AS w
      FROM counts
    ),
    totals AS (
      SELECT (SELECT SUM(cn) FROM counts) AS tn,
             (SELECT SUM(w) FROM weights) AS tw
    ),
    targets AS (
      -- overflow-safe split form of floor(tn*w/tw), as in
      -- corpus_temperature_resample
      SELECT lang, cn,
             (tn // tw) * w + ((tn % tw) * w) // tw AS target
      FROM weights, totals
    ),
    ranked AS (
      SELECT t.doc_id, t.lang, t.n, g.cn, g.target,
             ROW_NUMBER() OVER (
               PARTITION BY t.lang
               ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id
             ) AS rk
      FROM train t JOIN targets g USING (lang)
    ),
    sel AS (
      SELECT lang, doc_id, n,
             target // cn + CASE WHEN rk <= target % cn THEN 1 ELSE 0 END
               AS n_copies
      FROM ranked
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_copies) AS BIGINT) AS n_copies,
           CAST(SUM(n_copies * n) AS BIGINT) AS total_tokens,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS sel_digest
    FROM sel WHERE n_copies > 0
    GROUP BY lang ORDER BY lang
    """,
)
def pipeline_e2e_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation chain in ONE lazy plan — length filter →
    exact dedup (keep-first on text digest) → train split (md5 bucket) →
    sqrt-temperature resampling → per-language mix rollup with a
    membership digest. The point is composition: every stage is the
    already-verified operator from this package, chained as DataFrames
    with no materialization barriers between them, and the WHOLE chain
    hash-verifies against a single DuckDB CTE pipeline.

    Scale (100 TB): Catalyst fuses the filter+digest stages into the scan
    projection; the chain's shuffles are the dedup groupBy (16-byte
    digests), the per-language rank window (hash-threshold swap at scale,
    see corpus_temperature_resample), and the final 5-group rollup.
    Text bytes never move past the first projection."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5("text").alias("th"),
        F.size(F.split("text", " ")).alias("n"),
    )
    lenf = d.filter(F.col("n").between(E2E_MIN_TOK, E2E_MAX_TOK))
    keeper = lenf.groupBy("th").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = lenf.join(keeper, "doc_id", "left_semi").select("doc_id", "lang", "n")
    bucket = md5_bucket(F.col("doc_id"))
    train = deduped.filter(bucket < SPLIT_TRAIN)
    counts = train.groupBy("lang").agg(F.count("*").alias("cn"))
    targets = _sqrt_temperature_targets(counts, "cn")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    ranked = train.join(F.broadcast(targets), "lang").withColumn("rk", rk)
    sel = ranked.withColumn(
        "n_copies",
        (
            F.expr("target DIV cn")
            + F.when(F.col("rk") <= F.col("target") % F.col("cn"), 1).otherwise(0)
        ).cast("bigint"),
    ).filter(F.col("n_copies") > 0)
    ordered_ids = F.expr(
        "concat_ws(',', transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING)))"
    )
    return (
        sel.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_copies").cast("bigint").alias("n_copies"),
            F.sum(F.col("n_copies") * F.col("n")).cast("bigint").alias("total_tokens"),
            F.md5(ordered_ids).alias("sel_digest"),
        )
        .orderBy("lang")
    )
