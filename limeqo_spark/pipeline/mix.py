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


#: chunking geometry: window of 64 whitespace tokens, stride 48 (16-token
#: overlap keeps context across chunk boundaries, the standard LLM recipe)
CHUNK_W, CHUNK_S = 64, 48


@query(
    "corpus_chunk_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, n,
             UNNEST(generate_series(0,
               CASE WHEN n <= {CHUNK_W} THEN 0
                    ELSE CAST(CEIL(CAST(n - {CHUNK_W} AS DOUBLE) / {CHUNK_S}) AS BIGINT)
               END)) AS c
      FROM toks
    )
    SELECT ch.doc_id, CAST(ch.c AS BIGINT) AS chunk_id,
           CAST(LEAST({CHUNK_W}, ch.n - ch.c * {CHUNK_S}) AS BIGINT) AS n_tokens,
           MD5(array_to_string(t.t[ch.c * {CHUNK_S} + 1 :
                                   ch.c * {CHUNK_S} + {CHUNK_W}], ' ')) AS chunk_md5
    FROM chunks ch JOIN toks t USING (doc_id)
    ORDER BY doc_id, chunk_id
    """,
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking — the tokenize-and-window step that turns raw
    documents into fixed-length training sequences: 64-token windows with
    stride 48. Pure higher-order functions (sequence/transform/slice), so
    chunk boundaries AND the chunk bytes (md5) hash-verify cross-engine.
    Each chunk row carries its token count; the final (ragged) chunk is
    kept, matching what a packing stage would pad or merge downstream."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    d = d.withColumn("n", F.size("t"))
    n_last = (
        f"CASE WHEN n <= {CHUNK_W} THEN 0 "
        f"ELSE CAST(CEIL(CAST(n - {CHUNK_W} AS DOUBLE) / {CHUNK_S}) AS BIGINT) END"
    )
    chunks = d.select(
        "doc_id",
        "n",
        "t",
        F.explode(F.expr(f"sequence(CAST(0 AS BIGINT), {n_last})")).alias("chunk_id"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.least(F.lit(CHUNK_W), F.col("n") - F.col("chunk_id") * CHUNK_S)
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(
            F.expr(f"concat_ws(' ', slice(t, chunk_id * {CHUNK_S} + 1, {CHUNK_W}))")
        ).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


#: packing budget: tokens per training sequence bin
PACK_BUDGET = 512


@query(
    "corpus_pack_bins",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
             MD5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                 PARTITION BY lang ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT lang, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY lang, bin_id ORDER BY lang, bin_id
    """,
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — grouping shuffled documents into ~512-token
    training bins: md5-shuffle each language stream, running token cumsum,
    a document joins the bin its START falls in. Deterministic, seedless,
    engine-portable (bin membership hash-verifies against DuckDB).

    Scale note (100 TB): the window runs per LANGUAGE partition here; at
    scale you first split each language into salted shards (hash(doc) %%
    n_shards) and pack within shards — bins never cross shards, the window
    never sees more than a shard, and bin ids get the shard as a prefix.
    Same operator, one more partition column."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = W.partitionBy("lang").orderBy("h", "doc_id")
    packed = d.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, 0)) - F.col("n_tokens"))
            / PACK_BUDGET
        ).cast("bigint"),
    )
    return (
        packed.groupBy("lang", "bin_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


#: shard fan-out for the shard-local packing variant (the 100 TB shape)
PACK_SHARDS = 4


@query(
    "corpus_pack_bins_sharded",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
             MD5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    sharded AS (
      SELECT *, ('0x' || substr(h, 1, 4))::BIGINT * {PACK_SHARDS} // 65536
               AS shard
      FROM toks
    ),
    packed AS (
      SELECT lang, shard, doc_id, n_tokens,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                 PARTITION BY lang, shard ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin_id
      FROM sharded
    )
    SELECT lang, CAST(shard AS BIGINT) AS shard, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY lang, shard, bin_id ORDER BY lang, shard, bin_id
    """,
)
def corpus_pack_bins_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, shard-local — the EXECUTABLE form of the scale
    swap corpus_pack_bins documents: each language stream is first split
    into md5-range shards, the token-cumsum window runs per (lang, shard),
    and bins carry the shard as a prefix so they never cross shards. No
    window ever sees more than one shard of one language — the partition
    count scales with data while per-window state stays bounded. Same
    packing semantics, one more partition column, still hash-exact."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    # conv() returns STRING — cast to bigint BEFORE the multiply (the
    # curation.md5_bucket hardening, ADVICE r3): the implicit
    # string->double ride is exact only while the prefix stays 16-bit
    shard = F.expr(
        f"CAST(conv(substring(h, 1, 4), 16, 10) AS BIGINT) * {PACK_SHARDS} DIV 65536"
    ).cast("bigint")
    w = W.partitionBy("lang", "shard").orderBy("h", "doc_id")
    packed = d.withColumn("shard", shard).withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, 0)) - F.col("n_tokens"))
            / PACK_BUDGET
        ).cast("bigint"),
    )
    return (
        packed.groupBy("lang", "shard", "bin_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang", "shard", "bin_id")
    )


@query(
    "corpus_mix_quota_threshold",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    thresholds AS (
      SELECT lang, n, ({_quota_case()}) AS quota,
             -- Spark computes t as CAST(double AS BIGINT), which TRUNCATES;
             -- DuckDB's cast rounds, so trunc() is spelled out (FIXTURES §3)
             CAST(trunc((({_quota_case()}) * 4294967296.0) / n) AS BIGINT) AS t
      FROM counts
    ),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN thresholds th ON th.lang = d.lang
      WHERE CAST(concat('0x', substr(MD5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            < th.t
    ),
    per_lang AS (SELECT lang, COUNT(*) AS realized FROM kept GROUP BY lang)
    SELECT th.lang,
           CAST(th.quota AS BIGINT) AS quota,
           CAST(COALESCE(p.realized, 0) AS BIGINT) AS realized,
           ABS(COALESCE(p.realized, 0) - th.quota)
             <= 4 * sqrt(CAST(th.quota AS DOUBLE)) + 1 AS quota_ok
    FROM thresholds th LEFT JOIN per_lang p ON p.lang = th.lang
    ORDER BY th.lang
    """,
)
def corpus_mix_quota_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling, window-free — the EXECUTABLE form of the scale swap
    corpus_mix_quota_sample documents: instead of ranking each language by
    md5 (a per-language window), keep rows whose 64-bit hash prefix falls
    under a per-language threshold equal to the quota quantile of the hash
    space (``quota/n`` of 2^32 here). One scan, a 5-row broadcast of
    thresholds, NO window — the plan the same operator runs at 100 TB.
    Being a threshold on a uniform hash, the realized count is binomial
    around the quota rather than exact; each row carries its language's
    realized count, quota, and a 4-sigma ``ok`` bound (also rolled into
    ``prop_gates``). HASH (r9): every stage is deterministic md5/threshold
    arithmetic, so realized counts and the bound are value-checked against
    the identical DuckDB SQL — truncating division spelled out on both
    engines (FIXTURES §3)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    quota = F.expr(_quota_case())
    thresholds = counts.select(
        "lang",
        "n",
        quota.alias("quota"),
        # threshold over the first 8 hex chars (32-bit space)
        (quota * F.lit(2**32) / F.col("n")).cast("bigint").alias("t"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    kept = (
        d.withColumn("h", h)
        .join(F.broadcast(thresholds), "lang")
        .filter(F.col("h") < F.col("t"))
    )
    per_lang = kept.groupBy("lang").agg(F.count("*").alias("realized"))
    sigma = F.sqrt(F.col("quota").cast("double"))
    return (
        thresholds.join(per_lang, "lang", "left")
        .select(
            "lang",
            F.col("quota").cast("bigint").alias("quota"),
            F.coalesce("realized", F.lit(0)).cast("bigint").alias("realized"),
            (
                F.abs(F.coalesce("realized", F.lit(0)) - F.col("quota"))
                <= 4 * sigma + 1
            ).alias("quota_ok"),
        )
        .orderBy("lang")
    )


#: systematic-PPS sample size (evenly spaced picks in weight space)
PPS_K = 50

_PPS_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS wt,
         MD5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
cum AS (
  SELECT doc_id, lang, wt, h,
         SUM(wt) OVER (ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(wt) OVER () AS tot
  FROM w
)
SELECT doc_id, lang, wt,
       CAST((cw * {PPS_K}) // tot - ((cw - wt) * {PPS_K}) // tot AS BIGINT)
         AS n_picks
FROM cum
WHERE (cw * {PPS_K}) // tot > ((cw - wt) * {PPS_K}) // tot
ORDER BY doc_id
"""


@query("corpus_weighted_sample_pps", oracle=_PPS_ORACLE)
def corpus_weighted_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (probability-proportional-to-size) sampling, deterministic
    and integer-exact: documents are laid on a circle ordered by
    md5(doc_id) (a seedless uniform shuffle), weights (here ``n_chars`` —
    substitute any quality score) are cumulated, and K evenly spaced picks
    in weight space select documents — classic systematic PPS sampling.
    Each doc is picked with probability ~ K*w/W (docs heavier than W/K get
    multiple picks, reported as ``n_picks`` >= 1, exactly the replacement
    semantics weighted corpus mixing wants). Selection is pure integer
    arithmetic (BIGINT cumsum + integer division), so the exact picked set
    hash-verifies cross-engine — no float keys, no ln/pow (an
    Efraimidis-Spirakis float key would be libm-dependent at the margin).

    Scale: the fixture form uses one global cumsum window (single-reducer
    ordering). The 100 TB swap is the standard two-pass per-shard variant:
    pass 1 computes per-shard weight totals (tiny frame -> driver prefix
    sums -> broadcast per-shard offsets), pass 2 cumulates within shards
    and adds the offset — same arithmetic, no global window (the pattern
    ``corpus_shuffle_shards`` already demonstrates for row numbering)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("wt"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = d.select(
        "doc_id",
        "lang",
        "wt",
        F.sum("wt")
        .over(
            W.orderBy("h", "doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cw"),
        F.sum("wt").over(W.partitionBy()).alias("tot"),
    )
    hi = F.expr(f"(cw * {PPS_K}) DIV tot")
    lo = F.expr(f"((cw - wt) * {PPS_K}) DIV tot")
    return (
        cum.filter(hi > lo)
        .select("doc_id", "lang", "wt", (hi - lo).cast("bigint").alias("n_picks"))
        .orderBy("doc_id")
    )
