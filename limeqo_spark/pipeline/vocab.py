"""Distributed BPE vocabulary training (byte-pair encoding, Sennrich 2016)
as pure dataflow.

The tokenizer-training step of an LLM data pipeline: count words across
the corpus, explode words into character sequences, then repeatedly (a)
count adjacent symbol pairs weighted by word frequency, (b) pick the most
frequent pair, (c) fuse its non-overlapping (leftmost-first) occurrences.
Industrial BPE trainers do exactly this on the *word-frequency table* —
the corpus-scale work is ONE map-side-combinable word count; every merge
round then runs on a vocabulary-sized frame (distinct words x characters),
orders of magnitude smaller than the corpus.

Everything here is expressible in both engines with windows only — pair
counting via LEAD, greedy leftmost non-overlap fusion via a running
match-count + island-parity trick (no per-row UDF, no driver loop, no
self-join): within a run of consecutive matches (which only happens for
pairs like ('a','a') on 'aaaa'), leftmost-first fusion takes the matches
at even island offsets. Pair *selection* counts are the classic
overlapping zip(word, word[1:]) counts (Sennrich's reference counter);
*application* is leftmost non-overlapping, also matching the reference.

The merge chosen in round r feeds round r+1's transformation — in SQL
that is a scalar one-row CTE cross-joined in; on the Spark side the same
one-row frame broadcasts. The whole K-round trainer is ONE lazy plan: no
collect, no checkpoint, K unrolled window stages keyed by word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query

#: merge rounds trained (unrolled in both the plan and the oracle SQL)
BPE_ROUNDS = 3


def _round_ctes(r: int) -> str:
    """Oracle CTE chain for one merge round: seq{r-1} -> seq{r}."""
    p = r - 1
    return f"""
nxt{r} AS (
  SELECT word, wcnt, pos, sym,
         LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
  FROM seq{p}
),
best{r} AS (
  SELECT sym AS bs1, nsym AS bs2, SUM(wcnt) AS bcnt
  FROM nxt{r} WHERE nsym IS NOT NULL
  GROUP BY sym, nsym
  ORDER BY SUM(wcnt) DESC, sym, nsym
  LIMIT 1
),
mk{r} AS (
  SELECT n.word, n.wcnt, n.pos, n.sym, n.nsym,
         (n.sym = b.bs1 AND n.nsym = b.bs2) AS m
  FROM nxt{r} n CROSS JOIN best{r} b
),
mk2{r} AS (
  SELECT *, pos - rn_m AS grp FROM (
    SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END) OVER
        (PARTITION BY word ORDER BY pos
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn_m
    FROM mk{r})
),
mk3{r} AS (
  SELECT *, m AND ((rn_m - MIN(CASE WHEN m THEN rn_m END)
                    OVER (PARTITION BY word, grp)) % 2 = 0) AS fused
  FROM mk2{r}
),
mk4{r} AS (
  SELECT *, COALESCE(LAG(fused) OVER (PARTITION BY word ORDER BY pos),
                     FALSE) AS prev_fused
  FROM mk3{r}
),
seq{r} AS (
  SELECT word, wcnt,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN fused THEN sym || nsym ELSE sym END AS sym
  FROM mk4{r} WHERE NOT prev_fused
)"""


def _bpe_oracle(k: int) -> str:
    rounds = ",".join(_round_ctes(r) for r in range(1, k + 1))
    merge_rows = "\n  UNION ALL ".join(
        f"SELECT 'merge' AS kind, {r} AS round, bs1 AS left_sym, bs2 AS right_sym, "
        f"bs1 || bs2 AS sym, bcnt AS weight FROM best{r}"
        for r in range(1, k + 1)
    )
    return f"""
WITH words AS (
  SELECT word, COUNT(*) AS wcnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
pos0 AS (
  SELECT word, wcnt,
         UNNEST(generate_series(1, LENGTH(word))) AS p
  FROM words
),
seq0 AS (
  SELECT word, wcnt, CAST(p AS BIGINT) AS pos,
         substr(word, CAST(p AS INT), 1) AS sym
  FROM pos0
),{rounds},
merges AS (
  {merge_rows}
),
vocab AS (
  SELECT 'vocab' AS kind, {k} AS round,
         CAST(NULL AS VARCHAR) AS left_sym, CAST(NULL AS VARCHAR) AS right_sym,
         sym, SUM(wcnt) AS weight
  FROM seq{k} GROUP BY sym
)
SELECT kind, CAST(round AS BIGINT) AS round, left_sym, right_sym, sym,
       CAST(weight AS BIGINT) AS weight
FROM (SELECT * FROM merges UNION ALL SELECT * FROM vocab)
ORDER BY kind, round, weight DESC, sym
"""


def _merge_round(seq: DataFrame, r: int) -> tuple[DataFrame, DataFrame]:
    """One BPE merge round on a (word, wcnt, pos, sym) frame; returns the
    fused sequence frame and the one-row merge record for round ``r``."""
    w = W.partitionBy("word").orderBy("pos")
    nxt = seq.withColumn("nsym", F.lead("sym").over(w))
    pairs = (
        nxt.filter(F.col("nsym").isNotNull())
        .groupBy("sym", "nsym")
        .agg(F.sum("wcnt").alias("bcnt"))
    )
    best = (
        pairs.orderBy(F.desc("bcnt"), "sym", "nsym")
        .limit(1)
        .select(F.col("sym").alias("bs1"), F.col("nsym").alias("bs2"), "bcnt")
    )
    mk = (
        nxt.crossJoin(F.broadcast(best))
        .withColumn("m", (F.col("sym") == F.col("bs1")) & (F.col("nsym") == F.col("bs2")))
        .withColumn(
            "rn_m",
            F.sum(F.when(F.col("m"), 1).otherwise(0)).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .withColumn("grp", F.col("pos") - F.col("rn_m"))
    )
    mk = mk.withColumn(
        "min_rn",
        F.min(F.when(F.col("m"), F.col("rn_m"))).over(W.partitionBy("word", "grp")),
    )
    mk = mk.withColumn(
        "fused", F.col("m") & (((F.col("rn_m") - F.col("min_rn")) % 2) == 0)
    ).withColumn("prev_fused", F.coalesce(F.lag("fused").over(w), F.lit(False)))
    new_seq = (
        mk.filter(~F.col("prev_fused"))
        .select(
            "word",
            "wcnt",
            F.col("pos").alias("opos"),
            F.when(F.col("fused"), F.concat("sym", "nsym")).otherwise(F.col("sym")).alias("sym"),
        )
        .withColumn("pos", F.row_number().over(W.partitionBy("word").orderBy("opos")))
        .drop("opos")
    )
    merge_row = best.select(
        F.lit("merge").alias("kind"),
        F.lit(r).cast("bigint").alias("round"),
        F.col("bs1").alias("left_sym"),
        F.col("bs2").alias("right_sym"),
        F.concat("bs1", "bs2").alias("sym"),
        F.col("bcnt").cast("bigint").alias("weight"),
    )
    return new_seq, merge_row


@query("text_bpe_vocab_merges", oracle=_bpe_oracle(BPE_ROUNDS))
def text_bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first K BPE merges over the corpus and emit (a) one
    'merge' row per round — the learned merge rule with its weighted pair
    count — and (b) the full post-merge symbol vocabulary with weighted
    occurrence counts ('vocab' rows), which hash-verifies the entire final
    sequence state, not just the chosen rules.

    Scale: the only corpus-sized stage is the word count (map-side
    combinable groupBy); merge rounds run on the distinct-word frame,
    partitioned by word, shuffling ~|vocab| * avg_word_len short rows per
    round. The per-round best pair is a one-row broadcast. At 100 TB the
    word-frequency table is still GB-scale — exactly why production BPE
    trainers (and this operator) reduce to it first.
    """
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    seq = (
        words.select(
            "word",
            "wcnt",
            F.explode(F.expr("sequence(CAST(1 AS BIGINT), CAST(length(word) AS BIGINT))")).alias("pos"),
        )
        .withColumn("sym", F.expr("substr(word, CAST(pos AS INT), 1)"))
    )
    merge_rows: list[DataFrame] = []
    for r in range(1, BPE_ROUNDS + 1):
        seq, mrow = _merge_round(seq, r)
        merge_rows.append(mrow)
    ns = F.lit(None).cast("string")
    vocab = (
        seq.groupBy("sym")
        .agg(F.sum("wcnt").cast("bigint").alias("weight"))
        .select(
            F.lit("vocab").alias("kind"),
            F.lit(BPE_ROUNDS).cast("bigint").alias("round"),
            ns.alias("left_sym"),
            ns.alias("right_sym"),
            "sym",
            "weight",
        )
    )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.unionByName(vocab).orderBy("kind", "round", F.desc("weight"), "sym")


def _bpe_encode_oracle(k: int) -> str:
    rounds = ",".join(_round_ctes(r) for r in range(1, k + 1))
    return f"""
WITH words AS (
  SELECT word, COUNT(*) AS wcnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
pos0 AS (
  SELECT word, wcnt,
         UNNEST(generate_series(1, LENGTH(word))) AS p
  FROM words
),
seq0 AS (
  SELECT word, wcnt, CAST(p AS BIGINT) AS pos,
         substr(word, CAST(p AS INT), 1) AS sym
  FROM pos0
),{rounds},
tok AS (
  SELECT word, COUNT(*) AS n_syms,
         string_agg(sym, '|' ORDER BY pos) AS tok_str
  FROM seq{k} GROUP BY word
),
dpos AS (
  SELECT doc_id, t,
         UNNEST(generate_series(1, len(t))) AS o
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
dwords AS (
  SELECT doc_id, CAST(o AS BIGINT) AS o, t[CAST(o AS INT)] AS word
  FROM dpos
)
SELECT d.doc_id,
       CAST(SUM(tok.n_syms) AS BIGINT) AS n_tokens,
       MD5(string_agg(tok.tok_str, ' ' ORDER BY d.o)) AS tokens_md5
FROM dwords d JOIN tok ON d.word = tok.word
WHERE d.word <> ''
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


@query("text_bpe_encode", oracle=_bpe_encode_oracle(BPE_ROUNDS))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges — the ENCODE half
    of the tokenizer (``text_bpe_vocab_merges`` is the train half): the K
    merge rounds run once on the distinct-word frame, producing a
    word -> token-sequence lookup table (vocabulary-sized — exactly the
    cache fast tokenizers build), which then broadcast-joins onto the
    exploded corpus words; per document we emit the token count and an
    order-exact digest of the full token stream.

    Scale: tokenization cost splits into a vocabulary-sized merge
    computation (independent of corpus size) plus ONE corpus-sized
    explode-join-aggregate whose join side broadcasts. No UDFs, no
    window over the corpus; the per-doc token stream digest uses the
    sorted-collect_list == ordered-string_agg equivalence (the q58
    determinism pattern).
    """
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    seq = (
        words.select(
            "word",
            "wcnt",
            F.explode(
                F.expr("sequence(CAST(1 AS BIGINT), CAST(length(word) AS BIGINT))")
            ).alias("pos"),
        )
        .withColumn("sym", F.expr("substr(word, CAST(pos AS INT), 1)"))
    )
    for r in range(1, BPE_ROUNDS + 1):
        seq, _ = _merge_round(seq, r)
    tok = seq.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_syms"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, sym))),"
            " x -> x.sym), '|')"
        ).alias("tok_str"),
    )
    dwords = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("o", "word")
    ).filter(F.col("word") != "")
    return (
        dwords.join(F.broadcast(tok), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct(o, tok_str))),"
                    " x -> x.tok_str), ' ')"
                )
            ).alias("tokens_md5"),
        )
        .orderBy("doc_id")
    )
