"""Scalar-function batteries + dedup/tokenize — SURVEY §2B B28-B33, B37, B40.

Everything here is built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import scratch_dir, table
from limeqo_spark.relational.registry import query, raise_on_failed_gates


@query(
    "q28_string_battery",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTR(p_name, 1, 5)) AS head,
           CAST(LENGTH(p_name) AS BIGINT) AS len,
           CONCAT_WS('#', p_brand, p_type) AS tag,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS w,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
           TRIM(' ' || p_brand || ' ') AS trimmed
    FROM part ORDER BY p_partkey
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28 string functions: substr/upper/length/concat/regexp/like/trim.
    NULL semantics are aligned explicitly (review r8): tag uses concat_ws
    on BOTH engines (skips NULL args AND their separators) and trimmed
    uses NULL-propagating concatenation on both (Spark F.concat ≡ DuckDB
    ||) — the previous oracle CONCAT() treated NULLs as empty strings,
    which the all-populated fixture could never distinguish."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 5)).alias("head"),
        F.length("p_name").cast("bigint").alias("len"),
        F.concat_ws("#", "p_brand", "p_type").alias("tag"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("w"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    ).orderBy("p_partkey")


@query(
    "q29_date_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS mo,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
           CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS dd
    FROM orders ORDER BY o_orderkey
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29 date/time functions: extract, trunc, date_add, datediff."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        # dates leave the engine as ISO strings: a DATE fetches as a
        # midnight datetime in some client layers, which breaks value-hash
        # comparison; yyyy-MM-dd strings are representation-proof.
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("mo"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("bigint").alias("dd"),
    ).orderBy("o_orderkey")


@query(
    "q30_math_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_quantity), 4) AS sq,
           ROUND(LN(1 + l_extendedprice), 4) AS lnp,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS cd,
           CAST(FLOOR(l_tax * 100) AS BIGINT) AS ft,
           ROUND(POW(2, l_linenumber), 4) AS p2,
           ABS(ROUND(l_extendedprice - l_quantity * 1000, 2)) AS ab
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 math battery incl. the log1p/expm1 pair the modeling layer uses
    (A8): Spark LOG1P(x) == oracle LN(1+x) to 4dp."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 4).alias("sq"),
        F.round(F.log1p("l_extendedprice"), 4).alias("lnp"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("cd"),
        F.floor(F.col("l_tax") * 100).cast("bigint").alias("ft"),
        F.round(F.pow(F.lit(2), F.col("l_linenumber")), 4).alias("p2"),
        F.abs(F.round(F.col("l_extendedprice") - F.col("l_quantity") * 1000, 2)).alias("ab"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q31_array_explode",
    oracle="""
    SELECT l_orderkey, l_linenumber, COUNT(*) AS n_vals,
           CAST(ROUND(SUM(CAST(v AS DECIMAL(18,6))), 4) AS DOUBLE) AS sv
    FROM (
      SELECT l_orderkey, l_linenumber, UNNEST([l_quantity, l_discount, l_tax]) AS v
      FROM lineitem
    ) t
    GROUP BY l_orderkey, l_linenumber ORDER BY l_orderkey, l_linenumber
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31 array build + explode + re-aggregate (higher-order array path)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.explode(F.array("l_quantity", "l_discount", "l_tax")).alias("v"),
        )
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.count("*").alias("n_vals"),
            F.round(F.sum(F.col("v").cast("decimal(18,6)")), 4).cast("double").alias("sv"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q32_struct_battery",
    oracle="""
    SELECT n_nationkey,
           {'n_name': n_name, 'n_regionkey': n_regionkey}.n_name AS sname,
           CAST({'n_name': n_name, 'n_regionkey': n_regionkey}.n_regionkey AS BIGINT) AS sreg
    FROM nation ORDER BY n_nationkey
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32 struct build + field extraction."""
    n = table(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name"), F.col("n_regionkey"))
    return n.select(
        "n_nationkey",
        s.getField("n_name").alias("sname"),
        s.getField("n_regionkey").cast("bigint").alias("sreg"),
    ).orderBy("n_nationkey")


@query(
    "q33_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS ks,
           COUNT(json_extract_string(props, '$.nope')) AS missing_nonnull,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33 JSON path extraction (get_json_object) incl. missing-key NULLs."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).cast("bigint").alias("ks"),
            F.count(F.get_json_object("props", "$.nope")).alias("missing_nonnull"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "q37_dedup_exact",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT MD5(text)) AS n_unique
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37 exact dedup accounting: per-lang doc counts vs distinct text hashes.

    At scale: hash first (md5 -> 32 bytes) so the distinct shuffles digests,
    never full documents.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .orderBy("lang")
    )


@query(
    "q40_tokenize_counts",
    oracle="""
    SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
    FROM (
      SELECT lang, UNNEST(string_split_regex(LOWER(text), '[^a-z0-9]+')) AS tok
      FROM documents
    ) t
    WHERE tok <> ''
    GROUP BY lang ORDER BY lang
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40 text tokenize: lowercase regex split, explode, count per lang."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("lang")
        .agg(F.count("*").alias("n_tokens"), F.countDistinct("tok").alias("n_distinct"))
        .orderBy("lang")
    )


#: (seed1, seed2) for the q63 reproducibility half of the gate — equal by
#: contract; the negative test plants a mismatch to prove the gate raises
_Q63_SEEDS = (41, 41)


@query("q63_stratified_sample", oracle=None, check="prop")
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-stratum Bernoulli fractions over
    order priorities — the rebalancing primitive for skewed training-data
    classes. PROP: per-stratum counts within 4 sigma of fraction * N and
    the seeded sample reproduces itself exactly (same seed => same rows);
    a violation RAISES (GateFailure -> driver-visible err, VERDICT r9 #3).

    Returns (stratum, n_total, n_sampled, frac, ok)."""
    o = table(spark, sf_dir, "orders")
    fractions = {"1-URGENT": 0.5, "2-HIGH": 0.2, "3-MEDIUM": 0.1,
                 "4-NOT SPECIFIED": 0.05, "5-LOW": 0.01}
    s1 = o.sampleBy("o_orderpriority", fractions, seed=_Q63_SEEDS[0])
    s2 = o.sampleBy("o_orderpriority", fractions, seed=_Q63_SEEDS[1])
    rerun_equal = s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    totals = o.groupBy("o_orderpriority").agg(F.count("*").alias("n_total"))
    sampled = s1.groupBy("o_orderpriority").agg(F.count("*").alias("n_sampled"))
    frac_col = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("o_orderpriority")]
    return raise_on_failed_gates(
        totals.join(sampled, "o_orderpriority", "left")
        .na.fill({"n_sampled": 0})
        .withColumn("frac", frac_col)
        .withColumn(
            "ok",
            (
                F.abs(F.col("n_sampled") - F.col("frac") * F.col("n_total"))
                <= 4 * F.sqrt(F.col("frac") * (1 - F.col("frac")) * F.col("n_total")) + 1
            )
            & F.lit(rerun_equal),
        )
        .select(
            F.col("o_orderpriority").alias("stratum"),
            "n_total", "n_sampled",
            F.round("frac", 2).alias("frac"),
            "ok",
        )
        .orderBy("stratum"),
        "q63_stratified_sample",
    )


#: negative-test hook: when set, the q64 gate checks written file sizes
#: against THIS cap instead of the one the writer was configured with
_Q64_CHECK_CAP: int | None = None


@query("q64_sized_file_sink", oracle=None, check="prop")
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-file sizing (maxRecordsPerFile): the lake-management knob that
    keeps 100 TB writes from producing either 10-GB unsplittable files or
    millions of tiny ones. PROP: every written file respects the record
    cap, the row count survives the roundtrip, and the writer produced at
    least ceil(rows/cap) files; a violation RAISES (GateFailure ->
    driver-visible err, VERDICT r9 #3). Returns one row of the checked
    facts."""
    import glob
    import math

    import pyarrow.parquet as pq

    cap = 50_000
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    out = scratch_dir(prefix="limeqo_q64_")
    li.write.mode("overwrite").option("maxRecordsPerFile", cap).parquet(out)
    files = glob.glob(f"{out}/*.parquet")
    per_file = [pq.ParquetFile(f).metadata.num_rows for f in files]
    n_in = li.count()
    n_back = spark.read.parquet(out).count()
    # _Q64_CHECK_CAP lets the negative test plant a violated bound
    # without touching what the writer was asked to do
    check_cap = _Q64_CHECK_CAP if _Q64_CHECK_CAP is not None else cap
    ok = (
        bool(per_file)
        and max(per_file) <= check_cap
        and n_back == n_in
        and len(files) >= math.ceil(n_in / cap)
    )
    return raise_on_failed_gates(
        spark.createDataFrame(
            [(n_in, n_back, len(files), max(per_file) if per_file else 0, ok)],
            "rows_in bigint, rows_back bigint, n_files int, max_file_rows bigint, ok boolean",
        ),
        "q64_sized_file_sink",
    )


#: negative-test hook: planted offset between the computed target file
#: count and what the q87 gate expects (0 in production)
_Q87_TARGET_OFFSET = 0


@query("q87_compact_small_files", oracle=None, check="prop")
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — q64's inverse and the other half of lake
    maintenance: a directory fragmented into ~64 tiny files is rewritten
    into ceil(bytes/target) right-sized files. The rewrite sizes itself
    from the INPUT's actual on-disk bytes (files.maxPartitionBytes-style
    math, no hardcoded partition count), so the same code compacts a
    100 TB directory. PROP: file count collapses to the computed target,
    no data changes (full-column checksum equality before/after), and no
    residual file is tiny."""
    import glob
    import math
    import os as _os

    frag = scratch_dir(prefix="limeqo_q87_frag_")
    out = scratch_dir(prefix="limeqo_q87_out_")
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    frag_files = glob.glob(f"{frag}/*.parquet")
    in_bytes = sum(_os.path.getsize(f) for f in frag_files)
    # stand-in for the 128-256MB production target, but never more than
    # a quarter of the fragment count: a FIXED 256KB target exceeds 64
    # output files once the slice passes ~16MB (sf >= ~0.5) and the
    # "fewer files than before" gate would fail on correct behavior
    # (review r8) — production compaction sizes target = bytes/target_n
    # the same way
    target_bytes = max(256 * 1024, math.ceil(in_bytes / 16))
    n_out = max(1, math.ceil(in_bytes / target_bytes))

    src = spark.read.parquet(frag)
    src.repartition(n_out).write.mode("overwrite").parquet(out)
    out_files = glob.glob(f"{out}/*.parquet")

    def checksum(df) -> int:
        row = df.agg(
            # decimal sum: 64-bit hash values overflow a long SUM under ANSI
            F.sum(
                F.xxhash64("event_id", "user_id", F.round("value", 4)).cast(
                    "decimal(38,0)"
                )
            ).alias("c"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (row["c"], row["n"])

    ok = (
        len(out_files) == n_out + _Q87_TARGET_OFFSET
        and len(out_files) < len(frag_files)
        and checksum(spark.read.parquet(out)) == checksum(src)
    )
    return raise_on_failed_gates(
        spark.createDataFrame(
            [(len(frag_files), len(out_files), n_out, in_bytes, ok)],
            "files_before int, files_after int, target_files int, bytes_in bigint, ok boolean",
        ),
        "q87_compact_small_files",
    )


@query(
    "q90_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice / NULLIF(l_quantity, 0) AS DOUBLE) IS NULL
             AS div_nulled,
           CAST(FLOOR(CAST(l_extendedprice / NULLIF(l_quantity, 0) AS DOUBLE)
                      * 10000) AS BIGINT) AS unit_price_e4,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT) AS line_as_int,
           TRY_CAST(l_shipdate AS DATE) IS NOT NULL AS date_parses
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe function battery: sessions run Spark 4's ANSI
    dialect (overflow/parse errors THROW), so production expressions use
    the ``try_*`` family — ``try_divide`` yields NULL on zero divisors
    where plain ``/`` would raise, ``try_cast`` yields NULL on malformed
    input. DuckDB mirrors with NULLIF-guarded division and TRY_CAST."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    unit = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        unit.isNull().alias("div_nulled"),
        # floor-scaled, not ROUND(double, 4): the IEEE quotient is
        # bit-identical across engines but ROUND's tie handling is not
        # (Spark rounds the shortest repr, DuckDB the binary value)
        F.floor(unit.cast("double") * 10000).cast("bigint").alias("unit_price_e4"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999999")).cast("bigint").alias(
            "flag_as_int"
        ),
        F.try_to_number(
            F.col("l_linenumber").cast("string"), F.lit("999999")
        ).cast("bigint").alias("line_as_int"),
        F.try_to_date(F.col("l_shipdate").cast("string")).isNotNull().alias(
            "date_parses"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q95_map_battery",
    oracle="""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS toks
      FROM part WHERE p_partkey < 400
    )
    SELECT p_partkey,
           CAST(len(list_distinct(toks)) AS BIGINT) AS map_size,
           CAST(LEN(toks[1]) AS BIGINT) AS first_len,
           md5(array_to_string(list_sort(list_distinct(toks)), ',')) AS keys_md5,
           CAST(list_sum(list_transform(list_distinct(toks), x -> LEN(x)))
                AS BIGINT) AS values_sum
    FROM t ORDER BY p_partkey
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function battery (SURVEY B32's map half): build a real MapType
    column (token -> token length via ``map_from_arrays``; duplicate keys
    pre-deduped — ANSI mode throws on them), then exercise ``size``,
    ``element_at``, ``map_keys``, ``map_values``. DuckDB has no MAP parity
    guarantee, so the oracle recomputes every emitted value from the
    token array directly — the map is verified by its observable
    contents."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    t = p.select(
        "p_partkey",
        F.array_distinct(F.split("p_name", " ")).alias("toks"),
        F.split("p_name", " ").alias("raw"),
    )
    m = F.map_from_arrays("toks", F.expr("transform(toks, x -> length(x))"))
    return (
        t.withColumn("m", m)
        .select(
            "p_partkey",
            F.size("m").cast("bigint").alias("map_size"),
            F.length(F.expr("raw[0]")).cast("bigint").alias("first_len"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.map_keys("m")))
            ).alias("keys_md5"),
            F.expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").alias(
                "values_sum"
            ),
        )
        .orderBy("p_partkey")
    )
