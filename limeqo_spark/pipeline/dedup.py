"""Deduplication operators (SURVEY §2B B37-B38 + north-star suite): exact,
n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine near-dup.

Scale design: exact dedup shuffles 16-byte digests, never documents; the
Jaccard join is blocked (shingle-inverted-index join) so only docs sharing a
shingle are paired; MinHash/SimHash band buckets bound candidate pairs at
100 TB; all-pairs forms appear only behind threshold filters on the tiny
embeddings fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.pipeline.corpus import (
    CORPUS_SQL,
    EMB_PLANT_N,
    EMB_PLANT_OFFSET,
    planted_corpus,
    planted_embeddings,
    shingle_transform_sql,
    token_shingles,
)
from limeqo_spark.relational.registry import query, retain


@query(
    "dedup_exact_keep_first",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    keyed AS (SELECT doc_id, MD5(text) AS h FROM corpus)
    SELECT h, MIN(doc_id) AS keep_doc, COUNT(*) AS n_copies
    FROM keyed GROUP BY h HAVING COUNT(*) > 1 ORDER BY h
    """,
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-lowest-id policy. (The planted corpus has no exact
    text dups, so we key on md5 of text — groups >1 would be real dups;
    with this corpus the interesting output is empty, proving no
    false-positive collapse.) See q37 for the per-lang accounting."""
    c = planted_corpus(spark, sf_dir)
    return (
        c.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("h")
    )


#: shared exact-Jaccard oracle plumbing: corpus → 3-token shingles →
#: per-doc sizes → pairwise common-shingle counts. ONE definition feeds
#: both jaccard entries' oracles AND the clustering oracle's edge set
#: (cluster._PAIRS_SQL) — the capped variant's contract is that it
#: reproduces this exact SQL, so the string must not be able to drift.
JACCARD_COMMON_SQL = f"""
    corpus AS ({CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i : i + 2], ' ') AS shingle
      FROM (
        SELECT doc_id, t, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS i
        FROM toks
      ) z
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
"""

#: the full exact-Jaccard pair oracle at tau=0.6 — shared verbatim by
#: dedup_ngram_jaccard and dedup_ngram_jaccard_capped (same string object)
JACCARD_PAIRS_ORACLE = f"""
    WITH {JACCARD_COMMON_SQL}
    SELECT a, b, ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 4) AS jaccard
    FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
    WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.6
    ORDER BY a, b
    """


@query(
    "dedup_ngram_jaccard",
    oracle=JACCARD_PAIRS_ORACLE,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-token shingle) Jaccard near-dup pairs at tau=0.6 via a
    shingle inverted-index join — only docs sharing a shingle are compared
    (the 100 TB-safe blocking; no all-pairs cross join)."""
    return ngram_jaccard_pairs(planted_corpus(spark, sf_dir), n=3, tau=0.6)


@query(
    "dedup_ngram_jaccard_capped",
    oracle=JACCARD_PAIRS_ORACLE,
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-hardened variant of dedup_ngram_jaccard: candidate pairs
    come only from shingles whose document frequency is <= a cap (hot
    "stop-shingles" would otherwise pair quadratically many docs — one
    shingle in 1M docs = 5e11 candidate rows), and the exact Jaccard is then
    computed per candidate via set intersection, NOT via the hot join.

    Pairs sharing ONLY hot shingles are missed by construction — but such
    pairs have near-zero Jaccard at any useful tau, which is why the oracle
    here is the SAME exact-Jaccard SQL: at tau=0.6 the capped output must be
    identical to the uncapped one."""
    c = planted_corpus(spark, sf_dir)
    return ngram_jaccard_pairs(c, n=3, tau=0.6, max_doc_freq=50)


def ngram_jaccard_pairs(
    corpus: DataFrame,
    n: int = 3,
    tau: float = 0.6,
    max_doc_freq: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Near-dup pairs with Jaccard >= tau over n-token shingles.

    With ``max_doc_freq`` set, the inverted-index join runs only over
    shingles appearing in <= that many documents (no hot-key blowup), and
    the exact common count is completed with a per-pair correction from
    *hot*-shingle sets only — hot shingles are few by construction (a
    shingle must clear the df cap), so the correction arrays are tiny.
    Pairs whose entire overlap is hot shingles are missed by construction
    (they cannot reach a useful tau unless the docs are all boilerplate)."""
    # keyed retention, not a bare cache: four registered entries call this
    # helper, and a per-invocation cache pin accumulates across a long
    # driver session (the registry.retain contract, ADVICE r7 / review r8).
    # The key carries the corpus plan identity (ADVICE r8): a fixed key would
    # let a second jaccard entry over a DIFFERENT corpus evict the first
    # entry's still-referenced shingle cache mid-session.
    #
    # The cached relation carries each doc's distinct-shingle count ``sz``
    # alongside every shingle row (opt r11): the count window runs over the
    # doc_id partitioning the corpus already has (no new exchange), and the
    # candidate pairs then COME OUT of the inverted-index join already
    # carrying (sa, sb) — the former post-hoc joins against a separate
    # ``sizes`` relation are gone. At 100 TB those were two data-sized
    # shuffles of the pair frame (sizes has one row per document, far past
    # broadcast range); now the sizes ride the existing shuffle as one
    # extra long per row (guide §2.4: remove shuffles outright).
    sh = retain(
        f"jaccard_shingles_{n}_{corpus.semanticHash()}",
        token_shingles(corpus, n).withColumn(
            "sz", F.count("*").over(W.partitionBy("doc_id"))
        ),
    )
    idx, hot_sets = sh, None
    if max_doc_freq is not None:
        # eager localCheckpoint (opt r11): ``hot`` feeds TWO broadcasts (the
        # anti-join and the hot-set correction), and an unmaterialized plan
        # re-ran the full df aggregate over the shingle index for each —
        # the checkpoint runs it once. The frame is tiny by construction
        # (only shingles clearing the df cap), so materializing it is safe
        # at any corpus size.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
            .localCheckpoint(eager=True)
        )
        # NO hot shingles -> the correction is the identity (opt r12): the
        # anti-join drops nothing and the hot-set machinery would only add
        # an aggregate over the index plus TWO pair-frame joins against an
        # EMPTY relation — at x16 the pair frame is 18M rows and those
        # no-op joins measured ~2x the whole uncapped query (the x16
        # perturbed probe has no shingle over the df cap). The checkpoint
        # is already materialized, so the emptiness probe is one head()
        # over its partitions; corpora with real boilerplate (df > cap)
        # take the full correction path unchanged at any scale.
        if hot.head(1):
            idx = sh.join(F.broadcast(hot), "shingle", "left_anti")
            hot_sets = (
                sh.join(F.broadcast(hot), "shingle")
                .groupBy("doc_id")
                .agg(F.collect_set("shingle").alias("hs"))
            )
    common = (
        idx.select(F.col("doc_id").alias("a"), "shingle", F.col("sz").alias("sa"))
        .join(
            idx.select(
                F.col("doc_id").alias("b"), "shingle", F.col("sz").alias("sb")
            ),
            "shingle",
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("c_rare"),
            # every row of a (a, b) group carries the same sa/sb — min is
            # just the hash-aggregable way to pick the constant
            F.min("sa").alias("sa"),
            F.min("sb").alias("sb"),
        )
    )
    pairs = common
    if hot_sets is not None:
        pairs = (
            pairs.join(
                hot_sets.select(F.col("doc_id").alias("a"), F.col("hs").alias("ha")),
                "a",
                "left",
            )
            .join(
                hot_sets.select(F.col("doc_id").alias("b"), F.col("hs").alias("hb")),
                "b",
                "left",
            )
            .withColumn(
                "c",
                F.col("c_rare")
                + F.when(
                    F.col("ha").isNotNull() & F.col("hb").isNotNull(),
                    F.size(F.array_intersect("ha", "hb")),
                ).otherwise(F.lit(0)),
            )
        )
    else:
        pairs = pairs.withColumn("c", F.col("c_rare"))
    jac = pairs.withColumn(
        "jaccard_raw", F.col("c").cast("double") / (F.col("sa") + F.col("sb") - F.col("c"))
    )
    out = jac.filter(F.col("jaccard_raw") >= tau).select(
        "a", "b", F.round("jaccard_raw", 4).alias("jaccard")
    )
    # ``ordered`` is the PAIR queries' output contract; the clustering
    # consumers feed the pairs straight into connected components, where a
    # global sort is a wasted range exchange (opt r11, guide §2.4 — an
    # orderBy used only to make output deterministic)
    return out.orderBy("a", "b") if ordered else out


#: Portable MinHash: x = first-8-hex-chars of md5(shingle) as int (identical
#: in Spark `conv(substr(md5,1,8),16,10)` and DuckDB `('0x'||...)::BIGINT`),
#: permutations h_i(x) = (a_i * (x % P) + b_i) % P over the Mersenne prime
#: P = 2^31-1 (products stay < 2^62 — no int64 overflow in either engine).
_MH_P = 2147483647
_MH_AB = [
    (2128164061, 398802782),
    (596987483, 1147225393),
    (1916785055, 1479347476),
    (972347433, 116450322),
    (291219901, 430979121),
    (234034475, 1406942087),
    (1761180996, 1267685540),
    (924035317, 1172698795),
    (2038977239, 402639405),
    (2143289124, 1357670270),
    (1355823819, 2113210625),
    (668925749, 252657889),
    (1177825180, 428031840),
    (1696544698, 230896653),
    (794664036, 1758809000),
    (1480032976, 858479239),
]
_MH_K = len(_MH_AB)  # 16 signatures -> 4 bands x 4 rows
_MH_BANDS, _MH_ROWS = 4, 4

#: shared shingle CTE for the DuckDB oracles (same 3-token shingles as
#: `token_shingles`, already hash-verified by the jaccard oracles)
_SHINGLE_SQL = f"""
    corpus AS ({CORPUS_SQL}),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i : i + 2], ' ') AS shingle
      FROM (
        SELECT doc_id, t, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS i
        FROM toks
      ) z
    )
"""


def _minhash_oracle_sql() -> str:
    sig_cols = ",\n             ".join(
        f"MIN(({a} * x + {b}) % {_MH_P}) AS s{i}" for i, (a, b) in enumerate(_MH_AB)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {j} AS band, "
        + ", ".join(f"s{_MH_ROWS * j + r} AS k{r}" for r in range(_MH_ROWS))
        + " FROM sigs"
        for j in range(_MH_BANDS)
    )
    band_keys = " AND ".join(f"x.k{r} = y.k{r}" for r in range(_MH_ROWS))
    matches = " + ".join(f"CAST(sa.s{i} = sb.s{i} AS INT)" for i in range(_MH_K))
    return f"""
    WITH {_SHINGLE_SQL},
    hx AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % {_MH_P} AS x
      FROM sh
    ),
    sigs AS (
      SELECT doc_id,
             {sig_cols}
      FROM hx GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y ON x.band = y.band AND {band_keys}
      WHERE x.doc_id < y.doc_id
    )
    SELECT c.a, c.b,
           ROUND(({matches}) / {float(_MH_K)}, 4) AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.a
    JOIN sigs sb ON sb.doc_id = c.b
    WHERE ({matches}) >= {_MH_K // 2}
    ORDER BY a, b
    """


def minhash_band_rows(docs: DataFrame, retain_key: str | None = None) -> DataFrame:
    """(doc_id, s0..s15, band, k0..k3): portable MinHash signatures (md5
    shingle ids, fixed linear permutations mod 2^31-1) exploded to banded
    keys — the ONE implementation behind both the batch LSH operator and
    the streaming band-store (q96); the streaming/batch parity contract
    depends on these being byte-identical.

    ``retain_key`` persists the signature frame under that key (opt r11):
    the LSH entry references the band rows on BOTH sides of its self-join,
    and an unpersisted plan re-ran the whole shingle->signature pipeline
    per side. Single-consumer callers (q96's band store) leave it None."""
    # rendered SQL expressions (opt r11): the Column-API formulation built
    # ~150 JVM Column objects per invocation (~0.5 s of driver time); the
    # strings are operator-identical, so signatures stay byte-identical
    hx = token_shingles(docs, 3).selectExpr(
        "doc_id",
        f"CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT) % {_MH_P} AS x",
    )
    sigs = hx.groupBy("doc_id").agg(
        *[
            F.expr(f"min(({a} * x + {b}) % {_MH_P}) AS s{i}")
            for i, (a, b) in enumerate(_MH_AB)
        ]
    )
    if retain_key is not None:
        sigs = retain(retain_key, sigs)
    bands_sql = ",".join(
        f"struct({j} AS band,"
        + ",".join(f"s{_MH_ROWS * j + r} AS k{r}" for r in range(_MH_ROWS))
        + ")"
        for j in range(_MH_BANDS)
    )
    return sigs.selectExpr(
        "doc_id",
        *[f"s{i}" for i in range(_MH_K)],
        f"explode(array({bands_sql})) AS bk",
    ).select("doc_id", *[f"s{i}" for i in range(_MH_K)], "bk.*")


@query("dedup_minhash_lsh", oracle=_minhash_oracle_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection with *portable deterministic* hashing
    (md5-derived shingle ids + fixed linear permutations mod 2^31-1), so the
    full pipeline — signatures, banding, candidate join, estimated Jaccard —
    is hash-verified against an identical DuckDB oracle. Candidates are pairs
    agreeing on any of 4 bands of 4 signature rows; survivors need >= 8/16
    matching signatures (est Jaccard >= 0.5).

    Scale design: signatures are a single groupBy with map-side-combinable
    MIN aggregates (one shuffle of (doc, 16 ints), never documents); the band
    join only pairs docs sharing a band key, bounding candidates the same way
    production MinHash dedup does at 100 TB. Signatures ride through the band
    explode as a struct so no re-join against the signature table is needed.
    """
    c = planted_corpus(spark, sf_dir)
    sig_struct = F.struct(*[F.col(f"s{i}") for i in range(_MH_K)]).alias("sig")
    bands = minhash_band_rows(c, retain_key="minhash_sigs").select(
        "doc_id", sig_struct, "band", *[f"k{r}" for r in range(_MH_ROWS)]
    )
    x, y = bands.alias("x"), bands.alias("y")
    matches = " + ".join(
        f"CAST(sa.s{i} = sb.s{i} AS INT)" for i in range(_MH_K)
    )
    # multi-band dedup on NARROW rows (opt r12, the ivf/bitext idiom): the
    # r11 .distinct() shuffled both 16-long signature structs per candidate
    # row purely to collapse pairs agreeing on several bands; counting the
    # signature matches MAP-SIDE first lets the dedup exchange carry
    # (a, b, m) — three longs instead of thirty-four — and a duplicate
    # pair recomputes the identical integer m, so min(m) just picks the
    # constant and the output is unchanged.
    est = (
        x.join(y, ["band"] + [f"k{r}" for r in range(_MH_ROWS)])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.sig").alias("sa"),
            F.col("y.sig").alias("sb"),
        )
        .withColumn("m", F.expr(matches))
        .groupBy("a", "b")
        .agg(F.min("m").alias("m"))
    )
    return (
        est.filter(F.col("m") >= _MH_K // 2)
        .select("a", "b", F.round(F.col("m") / float(_MH_K), 4).alias("est_jaccard"))
        .orderBy("a", "b")
    )


def minhash_mllib_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH variant (HashingTF set vectors -> approx similarity
    self-join). Kept as the library-idiom reference path — its hash family is
    engine-specific, so it is property-tested (planted-pair recall) rather
    than oracle-hashed; the registered `dedup_minhash_lsh` uses portable
    hashing and IS oracle-hashed."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    c = planted_corpus(spark, sf_dir)
    sh = token_shingles(c, 3)
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    vecs = tf.transform(sets).filter(F.expr("size(shingles) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.4, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
            F.round(1 - F.col("jaccard_dist"), 4).alias("est_jaccard"),
        )
        .filter(F.col("a") < F.col("b"))
        .orderBy("a", "b")
    )


#: SimHash geometry: the CANONICAL signature is 60 bits (md5 first 15 hex
#: chars — portable across engines without int64 sign issues) and the
#: near-dup verify is Hamming <= 8 over that 60-bit signature — fixed at
#: every corpus size. The band KEY, however, scales with the corpus
#: (round 6, VERDICT r5 #3, mirroring dedup_embedding_cosine's r5 fix):
#: each of the 4 keys is its 15-bit signature block EXTENDED with up to 16
#: extra sign-vote bits drawn from that band's own md5 hex range (chars
#: 16..31 — bits the 60-bit core never touches), where band_bits =
#: max(15, ceil(log2(4N))) so buckets/band >= 4N and the random-collision
#: candidate term stays O(N) at any scale. At the fixture sizes
#: (N <= 5030) the extension is empty and results are bit-identical to
#: the canonical 4x15 banding; at 10^9 docs it dials itself to 31-bit
#: keys (2^31 buckets — past ~5*10^8 docs the md5 budget is spent and a
#: wider base hash applies). The DuckDB oracle computes the SAME band_bits
#: from COUNT(*) inside the SQL, so the parameterization is hash-verified
#: at any probe scale, not merely mirrored.
_SH_BITS, _SH_BANDS = 60, 4
_SH_BAND_BITS = _SH_BITS // _SH_BANDS
_SH_MAX_BAND_BITS = 31  # 15 core + 16 extra (4 hex chars/band from md5 16..31)
_SH_HAMMING = 8


def _sh_band_bits(n_docs: int) -> int:
    """Adaptive band-key width: buckets/band >= 4 * n_docs, floor 15 bits
    (the canonical block), cap 31 (15 core + the 16 md5 bits available
    per band)."""
    import math

    return min(
        _SH_MAX_BAND_BITS,
        max(_SH_BAND_BITS, math.ceil(math.log2(4 * max(n_docs, 1)))),
    )


_SIMHASH_ORACLE = f"""
    WITH corpus AS ({CORPUS_SQL}),
    params AS (
      SELECT LEAST({_SH_MAX_BAND_BITS},
                   GREATEST({_SH_BAND_BITS},
                            CAST(CEIL(LOG2(4 * COUNT(*))) AS INT))) AS bb
      FROM corpus
    ),
    toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM corpus),
    hx AS (SELECT doc_id, md5(tok) AS m FROM toks),
    cv AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM (SELECT doc_id, ('0x' || substr(m, 1, 15))::BIGINT AS h,
                   UNNEST(generate_series(0, {_SH_BITS - 1})) AS b FROM hx) z
      GROUP BY doc_id, b
    ),
    csig AS (
      SELECT doc_id,
             SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
      FROM cv GROUP BY doc_id
    ),
    ev AS (
      SELECT doc_id, band, j,
             SUM(CASE WHEN (he >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM (SELECT doc_id, band,
                   ('0x' || substr(m, 16 + band * 4, 4))::BIGINT AS he,
                   UNNEST(generate_series(0, (SELECT bb FROM params) - {_SH_BAND_BITS + 1})) AS j
            FROM hx, (VALUES (0), (1), (2), (3)) bands(band)) z
      GROUP BY doc_id, band, j
    ),
    esig AS (
      SELECT doc_id, band,
             SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS es
      FROM ev GROUP BY doc_id, band
    ),
    cb AS (
      SELECT c.doc_id, c.sig, b.band
      FROM csig c CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)
    ),
    bands AS (
      SELECT cb.doc_id, cb.sig, cb.band,
             ((cb.sig >> (cb.band * {_SH_BAND_BITS})) & {(1 << _SH_BAND_BITS) - 1})
               | (COALESCE(e.es, 0) << {_SH_BAND_BITS}) AS key
      FROM cb LEFT JOIN esig e ON e.doc_id = cb.doc_id AND e.band = cb.band
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb
      FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
      WHERE x.doc_id < y.doc_id
    )
    SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {_SH_HAMMING}
    ORDER BY a, b
    """


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit signature = sign-aggregated per-bit votes of
    md5-derived token hashes (portable — identical ints in Spark and DuckDB,
    so signatures, banding, and Hamming filter are all hash-verified against
    the oracle); candidates = pairs agreeing on any of 4 bands; verified
    with exact Hamming distance <= 8 over the full 60-bit signature.

    All bit math is built-in integer expressions — no UDFs. The vote
    aggregation is 60 + 4 x extra map-side-combinable SUM columns (one
    shuffle of <= 124 ints per doc, never text), and banding bounds the
    candidate join.

    Scale (round 6, VERDICT r5 #3): the band KEY widens with the corpus —
    each 15-bit signature block is extended with extra = band_bits - 15
    sign-vote bits from that band's own md5 hex range (never the core
    bits), band_bits = max(15, ceil(log2(4N))) capped at 31 — the same
    buckets >= 4N rule dedup_embedding_cosine applies to its SRP bands. A
    fixed 15-bit key pairs ~N^2/32768 random collisions per band once
    N >> 32k docs (the failure mode the r5 x16 embedding probe measured at
    wall ratio ~3.0); the extension keeps expected bucket occupancy <= 1/4
    and the candidate term O(N). The near-dup SEMANTICS (60-bit signature,
    Hamming <= 8) do not move with N — near-identical docs agree on the
    extra sign bits too, so only nonzero-Hamming candidate recall trades
    against bucket size, the standard LSH knob — and at fixture scale the
    extension is empty, so results are bit-identical to the canonical
    banding. The counts sizing the bands are two pushed-down parquet
    row-counts (total + planted subset, matching the oracle's COUNT(*))."""
    from limeqo_spark.pipeline.corpus import PLANT_N

    c = planted_corpus(spark, sf_dir)
    # N must equal the oracle's COUNT(*) over the SAME corpus: a corpus with
    # fewer than PLANT_N docs below the id cutoff plants fewer clones, and a
    # hardcoded +PLANT_N would diverge at a ceil(log2(4N)) boundary (ADVICE
    # r6). ONE pushed-down parquet aggregate (opt r11 — was two separate
    # count jobs), no text movement.
    d = table(spark, sf_dir, "documents")
    nrow = d.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("doc_id") < PLANT_N, True)).alias("n_plant"),
    ).head()
    n_docs = nrow["n"] + nrow["n_plant"]
    extra = _sh_band_bits(n_docs) - _SH_BAND_BITS
    # All expressions below are rendered SQL strings handed to selectExpr in
    # a handful of py4j calls (opt r11): the Column-API formulation built
    # ~500 JVM Column objects per invocation and measured 2.4 s of pure
    # driver time (guide §7.3 — driver work serializes the whole session).
    # The rendered expressions are operator-for-operator identical, so the
    # oracle hash is unchanged.
    toks = c.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).selectExpr(
        "doc_id",
        "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) AS h",
        # extra-bit source per band: 4 hex chars (16 bits) from md5 16..31
        *[
            f"CAST(conv(substring(md5(tok), {16 + 4 * i}, 4), 16, 10) AS BIGINT)"
            f" AS he{i}"
            for i in range(_SH_BANDS)
        ],
    )
    # per-bit vote, SET-BIT-COUNT form (opt r12): the r11 formulation
    # mapped every (token, bit) to +-1 through a CASE and tested sum > 0;
    # summing the raw bit (shiftright & 1, no branch) and testing
    # 2*sum > n_tokens is the identical integer decision — sum(+-1) =
    # 2*sum(bit) - n, so sum(+-1) > 0 <=> 2*sum(bit) > n, ties (2s = n)
    # falling to 0 in both. ~80 CASE evaluations per token row become 80
    # bit-ops; the vote stage measured 0.963 -> 0.546 s warm at sf0.1,
    # with a committed exceptAll cross-check of all 64+extra sign bits
    # (0 differing rows) before the swap.
    bits = toks.selectExpr(
        "doc_id",
        *[f"(shiftright(h, {b}) & 1) AS b{b}" for b in range(_SH_BITS)],
        *[
            f"(shiftright(he{i}, {j}) & 1) AS e{i}_{j}"
            for i in range(_SH_BANDS)
            for j in range(extra)
        ],
    )
    votes = bits.groupBy("doc_id").agg(
        F.expr("count(*) AS nt"),
        *[F.expr(f"sum(b{b}) AS b{b}") for b in range(_SH_BITS)],
        *[
            F.expr(f"sum(e{i}_{j}) AS e{i}_{j}")
            for i in range(_SH_BANDS)
            for j in range(extra)
        ],
    )

    def vote_bit(col: str, shift: int) -> str:
        return (
            f"shiftleft(CASE WHEN 2 * {col} > nt THEN CAST(1 AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END, {shift})"
        )

    sig_sql = " | ".join(vote_bit(f"b{b}", b) for b in range(_SH_BITS))

    def ext_sig_sql(i: int) -> str:
        expr = "CAST(0 AS BIGINT)"
        for j in range(extra):
            expr = f"{expr} | {vote_bit(f'e{i}_{j}', j)}"
        return f"({expr}) AS es{i}"

    sigs = retain(
        "simhash_sigs",
        votes.selectExpr(
            "doc_id",
            f"({sig_sql}) AS sig",
            *[ext_sig_sql(i) for i in range(_SH_BANDS)],
        ),
    )
    _mask = (1 << _SH_BAND_BITS) - 1
    bands = sigs.selectExpr(
        "doc_id",
        "sig",
        "explode(array("
        + ",".join(
            f"struct({i} AS band,"
            f" (shiftright(sig, {i * _SH_BAND_BITS}) & {_mask})"
            f" | shiftleft(es{i}, {_SH_BAND_BITS}) AS key)"
            for i in range(_SH_BANDS)
        )
        + ")) AS bk",
    ).select("doc_id", "sig", "bk.band", "bk.key")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.sig").alias("sa"),
            F.col("y.sig").alias("sb"),
        )
        .distinct()
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
    return (
        ham.filter(F.col("hamming") <= _SH_HAMMING)
        .select("a", "b", F.col("hamming").cast("bigint").alias("hamming"))
        .orderBy("a", "b")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {EMB_PLANT_OFFSET}, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id < {EMB_PLANT_N}
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos_sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    ORDER BY a, b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine >= 0.95 over a corpus with planted
    exact copies. Round 4: the all-pairs crossJoin is retired — candidates
    come from SRP-LSH banding (seeded hyperplanes, 4 bands): only pairs
    agreeing on at least one full band are exactly re-scored. Round 5: the
    band width ADAPTS to the corpus — bits = max(8, ceil(log2(4N))), i.e.
    buckets/band >= 4N — keeping expected bucket occupancy <= 1/4 and the
    random-collision candidate term O(N) at any scale (a fixed 16-bit key
    is N^2/65536: the x16 replica probe measured wall ratio ~3.0 once N
    outgrew the bucket count; the r4 4-bit first cut was ~N^2/64, ratio
    6.9 at x4). The ORACLE stays ground-truth all-pairs:
    exact copies have identical sign patterns so recall is 1.0 by
    construction on the planted pairs (fixture max cross-cosine ~0.51 is
    far below threshold), and the driver hash-match doubles as that
    recall proof. For genuinely near (not identical) pairs at the
    threshold, per-band match probability is (1-theta/pi)^16 — the
    standard LSH recall/bucket-size trade. Built-in higher-order
    functions only (zip_with/aggregate — JVM-side)."""
    import math

    from limeqo_spark.pipeline.similarity import _hyperplanes

    e = planted_embeddings(spark, sf_dir)
    # Band width SCALES WITH THE CORPUS (round 5; x16 replica probe): with a
    # fixed 16-bit key the random-collision candidate term is N^2/65536 per
    # band — "linear plus true dups" only while N << 65536 (the probe
    # measured wall ratio ~3.0 at x16 even with clone copies perturbed out
    # of the dup threshold). Sizing buckets to >= 4N keeps expected bucket
    # occupancy <= 1/4, so random collisions stay O(N) at ANY corpus size —
    # at 10^9 vectors this dials itself to 32-bit bands (128 planes), the
    # same log2(N) rule FAISS-style LSH tables apply. Correctness is
    # unaffected by the width: the oracle is all-pairs ground truth, exact
    # copies share every sign pattern (recall 1.0 by construction), and the
    # fixture's max natural cross-cosine ~0.51 is far below the 0.95
    # threshold. N must equal the oracle's COUNT(*) over the same planted
    # set — a corpus with fewer than 20 vec_ids below the cutoff plants
    # fewer clones, and a hardcoded +20 would diverge at a ceil(log2(4N))
    # boundary (ADVICE r6, same fix as dedup_simhash). ONE pushed-down
    # parquet aggregate (opt r11 — was two separate count jobs), no vector
    # movement.
    base = table(spark, sf_dir, "embeddings").select("vec_id")
    nrow = base.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("vec_id") < EMB_PLANT_N, True)).alias("n_plant"),
    ).head()
    n_rows = nrow["n"] + nrow["n_plant"]
    n_bands = 4
    bits = max(8, math.ceil(math.log2(4 * n_rows)))
    n_planes = n_bands * bits
    planes = _hyperplanes(n_planes=n_planes, seed=11)
    # Signature pass = ONE Arrow-batched GEMM per batch (opt r11, guide
    # §4.2): the HOF-expression formulation evaluated n_planes x 64
    # interpreted lambda ops per row (~4k terms — the same pathology the
    # PQ encoder documented at ~0.5 ms/row; measured ~1 s of the query
    # wall here), while sign(X @ planes^T) is BLAS. Sign-bit semantics:
    # the LSH keys only steer candidate RECALL — the emitted pairs are
    # exactly re-scored and the oracle is all-pairs ground truth, and
    # exact planted copies produce identical sign patterns under any
    # summation order, so a float-reassociation sign flip on a random
    # near-orthogonal dot cannot change the output (the standard LSH
    # recall/bucket knob, as before). Same GEMM-batch precedent as
    # dedup_semantic_clusters' wide-codebook branch.
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    p_mat = planes.astype(np.float64)  # (n_planes, 64)
    weights = (1 << np.arange(bits, dtype=np.int64))

    def _band_keys_fn(emb):
        x = np.asarray(emb.to_list(), dtype=np.float64)
        sgn = ((x @ p_mat.T) > 0).astype(np.int64)  # (N, n_planes) sign bits
        keys = np.empty((len(x), n_bands), dtype=np.int64)
        for b in range(n_bands):
            keys[:, b] = sgn[:, b * bits : (b + 1) * bits] @ weights
        return pd.Series(list(keys))

    _band_keys_fn.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    _band_keys = pandas_udf(_band_keys_fn, "array<bigint>")

    bands = e.select(
        "vec_id", _band_keys("embedding").alias("keys")
    ).select("vec_id", F.posexplode("keys").alias("band", "key"))
    from limeqo_spark.relational.registry import retain

    # NARROW (vec_id, band, key): the 64 plane dots per vector run ONCE —
    # the self-join references this frame twice and an unpersisted plan
    # recomputes the whole signature scan per side (measured 2x the query
    # wall); embeddings rejoin only for the (tiny) candidate set below.
    # Keyed retention: re-invocations release the previous cache entry.
    bands = retain("srp_bands", bands)
    left = bands.select(F.col("vec_id").alias("a"), "band", "key")
    right = bands.select(F.col("vec_id").alias("b"), "band", "key")
    dot = "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    nrm = (
        "SQRT(aggregate({c}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    pairs = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea")), "a")
        .join(e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb")), "b")
        .withColumn(
            "cos_raw",
            F.expr(f"{dot} / ({nrm.format(c='ea')} * {nrm.format(c='eb')})"),
        )
        .filter(F.col("cos_raw") >= 0.95)
    )
    return pairs.select("a", "b", F.round("cos_raw", 4).alias("cos_sim")).orderBy("a", "b")


#: line-level dedup window: 16-token non-overlapping segments stand in for
#: "lines" (the fixture corpus is single-line word soup with no newlines)
LINE_W = 16


@query(
    "dedup_chunk_reconstruct",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, n,
             UNNEST(generate_series(0,
               CAST(CEIL(CAST(n AS DOUBLE) / {LINE_W}) AS BIGINT) - 1)) AS c
      FROM toks
    ),
    digests AS (
      SELECT ch.doc_id, ch.c,
             MD5(array_to_string(t.t[ch.c * {LINE_W} + 1 :
                                     ch.c * {LINE_W} + {LINE_W}], ' ')) AS h
      FROM chunks ch JOIN toks t USING (doc_id)
    ),
    keep AS (
      SELECT doc_id, c FROM (
        SELECT doc_id, c,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, c) AS rn
        FROM digests) WHERE rn = 1
    ),
    rebuilt AS (
      SELECT t.doc_id,
             CAST(CEIL(CAST(t.n AS DOUBLE) / {LINE_W}) AS BIGINT) AS n_chunks,
             COALESCE(k.n_kept, 0) AS n_kept,
             MD5(COALESCE(k.txt, '')) AS dedup_md5
      FROM toks t LEFT JOIN (
        SELECT keep.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               STRING_AGG(array_to_string(
                   t2.t[keep.c * {LINE_W} + 1 : keep.c * {LINE_W} + {LINE_W}],
                   ' '), ' ' ORDER BY keep.c) AS txt
        FROM keep JOIN toks t2 USING (doc_id) GROUP BY keep.doc_id
      ) k ON t.doc_id = k.doc_id
    )
    SELECT doc_id, n_chunks, n_kept, dedup_md5 FROM rebuilt ORDER BY doc_id
    """,
)
def dedup_chunk_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level exact dedup with document reconstruction (the CCNet-style
    pipeline stage: drop every repeated line corpus-wide, keep the first
    occurrence, re-emit the cleaned documents). The fixture corpus has no
    newlines, so non-overlapping {LINE_W}-token windows stand in for lines.

    Scale design — raw text NEVER shuffles:
    1. each doc emits (doc_id, chunk_id, md5) — digests only;
    2. the keeper per digest is MIN(struct(doc_id, chunk_id)), a
       map-side-combinable aggregate on the 16-byte hash;
    3. the kept (doc_id, chunk_id) int pairs — not the chunk text — come
       back to the documents table via a groupBy(doc_id) + join, and each
       surviving chunk is RE-SLICED from the original text in place.
    The only data crossing the wire is digests and int pairs; the rebuild
    is a single pass over the original partitioned corpus. Output carries
    md5 of the reconstructed text so the oracle verifies the actual
    rebuilt bytes."""
    # NO spread() here (opt r11, measured): this entry's explode is one
    # digest per 16-token chunk (~60k md5s at sf0.1, not the 1M+ of the
    # shingle entries), so repartitioning the full token arrays cost more
    # than the parallelism bought (bench read +0.35 s with it)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    d = d.withColumn("n", F.size("t")).withColumn(
        "n_chunks", F.ceil(F.col("n") / F.lit(float(LINE_W))).cast("bigint")
    )
    digests = d.select(
        "doc_id",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")).alias("c"),
        "t",
    ).select(
        "doc_id",
        "c",
        F.md5(F.expr(f"concat_ws(' ', slice(t, c * {LINE_W} + 1, {LINE_W}))")).alias("h"),
    )
    keep = (
        digests.groupBy("h")
        .agg(F.min(F.struct("doc_id", "c")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"), F.col("k.c").alias("c"))
    )
    kept_per_doc = keep.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sort_array(F.collect_list("c")).alias("kept"),
    )
    return (
        d.join(kept_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
            F.md5(
                F.when(
                    F.col("kept").isNotNull(),
                    F.expr(
                        "concat_ws(' ', flatten(transform(kept, "
                        f"c -> slice(t, CAST(c * {LINE_W} + 1 AS INT), {LINE_W}))))"
                    ),
                ).otherwise(F.lit(""))
            ).alias("dedup_md5"),
        )
        .orderBy("doc_id")
    )


#: substring-dedup gram width (tokens): spans shorter than this are noise
SUBSTR_K = 8


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM corpus
    ),
    grams AS (
      SELECT doc_id, s - 1 AS pos,
             md5(array_to_string(t[s : s + {SUBSTR_K} - 1], ' ')) AS gh
      FROM toks, UNNEST(generate_series(1, GREATEST(n - {SUBSTR_K} + 1, 0))) AS u(s)
    ),
    dup AS (
      SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2
    ),
    flagged AS (
      SELECT g.doc_id, g.pos,
             g.pos - ROW_NUMBER() OVER (
               PARTITION BY g.doc_id ORDER BY g.pos
             ) AS grp
      FROM grams g JOIN dup USING (gh)
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + {SUBSTR_K} AS BIGINT) AS span_len_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM flagged GROUP BY doc_id, grp
    ORDER BY doc_id, span_start
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup, the suffix-array method re-expressed as
    dataflow (Lee et al., "Deduplicating Training Data Makes Language
    Models Better": remove every substring that occurs >= 2 times in the
    corpus). A substring duplicated across (or within) documents is
    exactly a maximal run of consecutive duplicated {SUBSTR_K}-token
    grams, so the operator is: gram+position per document -> global
    occurrence count on the gram DIGEST -> flag positions whose gram
    repeats -> gaps-and-islands merge of consecutive flagged positions
    into spans. Output is the removal plan: (doc_id, span_start,
    span_len_tokens) byte-range analogs, hash-verified against DuckDB on
    the planted corpus (each planted clone shares its source's full text,
    so both members report one whole-document span).

    Scale (100 TB): no suffix array and no global sort — the corpus-wide
    structure is ONE two-phase count on 16-byte gram digests (positions
    and text never shuffle with it), the flag-back is a digest-keyed
    semi-join, and the island merge is a per-document window. Trillions of
    grams shuffle as (digest, count) partial aggregates; hot grams (boiler
    plate) skew the count's reduce side only, where AQE skew-split or the
    df-cap idiom from the Jaccard path applies. This is the engine's
    answer to the reference method's O(total-bytes) suffix automaton,
    which cannot shard without losing cross-shard duplicates."""
    c = planted_corpus(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    grams = c.select(
        "doc_id",
        F.explode(
            F.expr(
                shingle_transform_sql(
                    "t",
                    SUBSTR_K,
                    f"struct(i AS pos, md5(concat_ws(' ', slice(t, i + 1, {SUBSTR_K}))) AS gh)",
                )
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    # ONE pass over the grams (opt r11): the groupBy+semi-join formulation
    # ran the explode+md5 Generate TWICE (once under the dup aggregate,
    # once on the probe side) and shuffled the gram frame by gh twice at
    # scale (the "broadcast dup" only exists at fixture size — a 100 TB dup
    # set is data-sized, so the semi join was a second full gh shuffle).
    # The occurrence-count window flags duplicated grams in the single gh
    # exchange; hot grams (boilerplate) skew its reduce side exactly as
    # they skewed the count aggregate before — same df-cap/AQE answer.
    flagged = (
        grams.withColumn("n_occ", F.count("*").over(W.partitionBy("gh")))
        .filter(F.col("n_occ") >= 2)
        .drop("n_occ")
    )
    grp = (
        F.col("pos")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
    )
    return (
        flagged.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + SUBSTR_K).cast("bigint").alias(
                "span_len_tokens"
            ),
            F.count("*").cast("bigint").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_len_tokens", "n_grams")
        .orderBy("doc_id", "span_start")
    )


#: above-floor semantic-dedup codebooks, keyed (sf_dir, k)
_SEM_CENTER_CACHE: dict[tuple[str, int], "object"] = {}


def _train_semantic_centers(spark: SparkSession, sf_dir: str, k: int):
    """Wider-than-IVF KMeans codebook for above-floor corpora: seeded
    k-means|| (one init step, 5 Lloyd iterations) on a deterministic
    bounded sample — centroids need the density shape, not every vector
    (same rationale as ``similarity.train_ivf_centers_distributed``); only the k
    trained centroids reach the driver."""
    import numpy as np

    centers = _SEM_CENTER_CACHE.get((sf_dir, k))
    if centers is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        e = table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        sample = (
            e.orderBy("vec_id")
            .limit(max(4096, 16 * k))
            .select(array_to_vector(F.col("embedding")).alias("features"))
        )
        km = KMeans(k=k, seed=42, maxIter=5, initSteps=1, featuresCol="features")
        centers = np.asarray(km.fit(sample).clusterCenters())
        _SEM_CENTER_CACHE[(sf_dir, k)] = centers
    return centers


@query("dedup_semantic_clusters", oracle=None, check="prop")
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding corpus with the
    distributed MLlib KMeans quantizer (shared with the IVF ANN family —
    same memoized centroids, so the engine has ONE geometry), then find
    duplicate pairs ONLY within each cluster (exact cosine >= 0.95),
    resolve duplicate groups by connected components, and keep the member
    closest to its cluster centroid (ties broken by lowest vec_id, which
    keeps the original over its planted clone).

    This is the third — and at extreme scale the canonical — embedding
    dedup blocking strategy next to SRP-LSH banding
    (``dedup_embedding_cosine``) and brute force: clustering bounds the
    quadratic term to cluster size, and k grows with N so cluster size
    stays constant (SemDeDup ran it at LAION-5B scale). Within-cluster
    pair generation is a cell-keyed self-join (shuffle on cell_id);
    component resolution reuses the min-label kernel
    (``pipeline/cluster.py``), O(diameter) rounds on the tiny edge frame.

    The cluster count ADAPTS to the corpus — ``k = max(16, ceil(N/128))``,
    i.e. expected cluster size <= ~128 at any scale — because a fixed k
    makes the within-cluster self-join quadratic again as N grows (the
    same failure mode the adaptive LSH band widths fix). At the fixture
    SFs the floor keeps k = 16, sharing the IVF family's memoized
    quantizer; above the floor a separately-memoized KMeans fit on a
    bounded sample trains the wider codebook.

    ASSUMPTION (ADVICE r9): the k == 16 floor reuses the PINNED IVF
    centroids (trained on sf0.1's deterministic embedding sample), which
    is sound because every fixture SF draws from the same generator
    distribution. For a corpus whose embedding distribution diverges from
    the fixtures, cluster quality silently degrades — callers in that
    regime should refit via ``_train_semantic_centers(spark, sf_dir, 16)``
    (the same distributed path the k > 16 branch already takes).

    PROP (KMeans centroids are engine-local, no cross-engine oracle):
    unit gates assert every planted clone pair collapses to exactly the
    original, the kept set has no remaining within-cluster pair at the
    threshold, and every corpus vector appears exactly once.
    """
    import math

    from limeqo_spark.pipeline.cluster import connected_components_auto
    from limeqo_spark.pipeline.similarity import _ivf_centers
    from limeqo_spark.relational.registry import retain

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = planted_embeddings(spark, sf_dir, cast="array<double>")
    # ONE pushed-down count aggregate, no vector movement (the simhash
    # N-sizing idiom; opt r11 merged the two count jobs)
    nrow = base.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("vec_id") < EMB_PLANT_N, True)).alias("n_plant"),
    ).head()
    n_rows = nrow["n"] + nrow["n_plant"]
    k = max(16, math.ceil(n_rows / 128))
    centers = (
        _ivf_centers() if k == 16 else _train_semantic_centers(spark, sf_dir, k)
    )
    nlist = len(centers)
    if nlist <= 64:
        # fixture floor: nearest-centroid assignment + distance as one
        # JVM-side expression per row (no crossJoin, no window) — the
        # keeper score is the squared L2 distance to the OWN centroid
        from limeqo_spark.sqlexpr import matrix_lit

        cents_lit = F.expr(matrix_lit(centers))
        ranked = (
            f"sort_array(transform(sequence(0, {nlist - 1}), p -> struct("
            "aggregate(zip_with(cents[p], embedding, (c, x) -> (x - c) * (x - c)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d, p AS i)))[0]"
        )
        assigned = (
            corpus.withColumn("cents", cents_lit)
            .withColumn("best", F.expr(ranked))
            .select(
                "vec_id",
                "embedding",
                F.col("best.i").alias("cell_id"),
                F.col("best.d").alias("dist_c"),
            )
        )
    else:
        # wide codebooks: assignment is O(N*k) however you slice it (k
        # grows with N, so cluster-based dedup pays ~N^2/128 distance
        # terms) — the SemDeDup answer is to make the constant a BLAS
        # GEMM, exactly what an Arrow-batched pandas UDF gives: each
        # batch computes x^2 + c^2 - 2 X C^T as one matmul. The first
        # x16 probe ran the per-row HOF expression at k=251 and measured
        # wall ratio 4.69; the GEMM path is the recorded fix.
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        c_mat = np.asarray(centers, dtype=float)
        c_sq = (c_mat * c_mat).sum(axis=1)

        def _assign_fn(emb):
            x = np.stack(emb.to_numpy())
            d2 = (
                (x * x).sum(axis=1)[:, None]
                + c_sq[None, :]
                - 2.0 * (x @ c_mat.T)
            )
            i = d2.argmin(axis=1)  # ties -> lowest cell, like sort_array
            return pd.DataFrame(
                {"i": i.astype("int32"), "d": d2[np.arange(len(i)), i]}
            )

        # real type objects, not strings: this module's postponed
        # annotations (`from __future__ import annotations`) would leave
        # pandas_udf's signature inspection unresolvable
        _assign_fn.__annotations__ = {"emb": pd.Series, "return": pd.DataFrame}
        _assign = pandas_udf(_assign_fn, "struct<i: int, d: double>")

        assigned = corpus.withColumn("best", _assign("embedding")).select(
            "vec_id",
            "embedding",
            F.col("best.i").alias("cell_id"),
            F.col("best.d").alias("dist_c"),
        )
    # per-row L2 norm computed ONCE here (O(N*d)) so the within-cluster
    # pair filter below is a dot product only — the pair count is the
    # quadratic term (O(N*cluster_size) pairs at adaptive k), and paying
    # two sqrt-aggregate HOFs per PAIR instead of per ROW tripled the
    # pair stage's HOF work in the r7 x16 probe (pairs_s 11.5 of 45.8)
    assigned = assigned.withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> x * x),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        ),
    )
    # assigned feeds THREE consumers (the pair self-join's both sides, the
    # component label join, the final projection) — without a persist each
    # replays assignment; spill-safe level since the frame carries vectors.
    # Keyed retention (registry.retain) so sweep re-invocations don't stack
    # pinned cache entries (ADVICE r7).
    from pyspark.storagelevel import StorageLevel

    assigned = retain(
        "semdedup_assigned", assigned, StorageLevel.MEMORY_AND_DISK
    )
    lhs = assigned.select(
        "cell_id",
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    rhs = assigned.select(
        "cell_id",
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos_ab = (
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, v) -> acc + v) / (na * nb)"
    )
    edges = (
        lhs.join(rhs, "cell_id")
        .filter(F.col("a") < F.col("b"))
        .filter(F.expr(cos_ab) >= 0.95)
        .select("a", "b")
    )
    # size-dispatched CC: dup edge frames are a tiny minority of the corpus
    # by construction — the r7 probe measured 15 s of per-round job latency
    # iterating min-label over 20 edges; connected_components_auto solves
    # small frames driver-side and falls back to the O(log n) two-phase
    # kernel past 200k edges (the 100 TB path)
    comps = connected_components_auto(edges)
    labeled = assigned.join(
        comps, assigned.vec_id == comps.node, "left"
    ).select(
        "vec_id",
        "cell_id",
        "dist_c",
        F.coalesce("component", "vec_id").alias("component"),
    )
    w = W.partitionBy("component").orderBy("dist_c", "vec_id")
    return (
        labeled.withColumn("kept", F.row_number().over(w) == 1)
        .select("vec_id", F.col("cell_id").cast("bigint").alias("cell_id"),
                F.col("component").cast("bigint").alias("component"), "kept")
        .orderBy("vec_id")
    )
