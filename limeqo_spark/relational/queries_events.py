"""Batch event-analytics operators over the ``events`` table: gap
sessionization, ordered funnel, cohort retention — the standard
clickstream shapes a training-data pipeline runs before user-level
filtering or weighting. (The streaming analogs are q44c's session window
and q45's stateful totals; these are the backfill forms.)

Determinism: timestamps never leave a query raw (FIXTURES.md §3) — event
time becomes epoch seconds/microseconds via ``io.epoch_us`` on the Spark
side and ``epoch_ns(ts)`` arithmetic in DuckDB; money becomes integer
cents. Orderings always end on a unique key.

No reference counterpart (zixy17/LimeQO's core is the workload-matrix
loop); these extend the relational surface the way its deployment would
need, like `queries_scale.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import epoch_us, table
from limeqo_spark.relational.registry import query

#: a silence longer than this starts a new session (the classic 30 min)
SESSION_GAP_S = 1800


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (epoch_us("ts") / F.lit(1_000_000)).cast("bigint").alias("ts_s"),
        epoch_us("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )


@query(
    "events_sessionize_gap",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    lagged AS (
      SELECT *,
             CASE WHEN LAG(ts_s) OVER w IS NULL
                    OR ts_s - LAG(ts_s) OVER w > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    sess AS (
      SELECT *,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM lagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts_s) AS BIGINT) AS start_s,
           CAST(MAX(ts_s) - MIN(ts_s) AS BIGINT) AS dur_s,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM sess GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30 min silence starts a new session.
    The lag-flag-cumsum idiom — one window shuffle keyed by user_id
    (high-cardinality, so it spreads across 1000 executors), then a
    groupBy on (user, session) that reuses the same partitioning, so
    Catalyst plans a single Exchange for the whole chain. Session ids are
    per-user ordinals (1, 2, ...), not global — global ids would need a
    second, total-order shuffle that nothing downstream wants.

    Scale (100 TB): this is THE clickstream building block; the
    alternative people reach for — ``applyInPandas`` per user — moves
    every byte through Arrow for logic that two window functions express
    JVM-side. Streaming analog: q44c's native session window."""
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    new_s = (
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w) > SESSION_GAP_S),
            1,
        )
        .otherwise(0)
        .alias("new_s")
    )
    sess = ev.select("user_id", "event_id", "ts_s", "cents", new_s).withColumn(
        "session_idx",
        F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts_s").cast("bigint").alias("start_s"),
            (F.max("ts_s") - F.min("ts_s")).cast("bigint").alias("dur_s"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("bigint"))
        .orderBy("user_id", "session_idx")
    )


@query(
    "events_funnel_stages",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(epoch_ns(ts) // 1000) AS us
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts) // 1000) AS us
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) // 1000 > t1.us
      GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts) // 1000) AS us
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) // 1000 > t2.us
      GROUP BY 1
    )
    SELECT stage, users FROM (
      SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM t1
      UNION ALL
      SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM t2
      UNION ALL
      SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM t3
    ) ORDER BY stage
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user advances a stage
    only with an event STRICTLY AFTER their previous stage's first event
    (the part naive ``COUNT(DISTINCT user)``-per-type funnels get wrong —
    a purchase before the first view must not count). Three chained
    (filter → per-user min → join) hops; each per-user stage frame is at
    most one row per user — small relative to events, but UNBOUNDED in
    users, so the joins carry no broadcast hint (AQE broadcasts them
    when they fit; a forced hint would hard-fail past the 8GB broadcast
    limit at real user counts) and the event table is scanned once per
    stage with the type filter pushed down.

    Scale (100 TB): stage frames shrink monotonically (users, then
    converting users, ...) — the joins get cheaper down the funnel; no
    window over the full event stream is ever needed."""
    ev = _ev(spark, sf_dir)
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("us1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        # no broadcast hint: the stage frames are PER-USER (unbounded
        # cardinality) — a forced broadcast turns a planner decision into
        # a hard 8GB-limit failure at real user counts (review r8); AQE
        # still broadcasts them at fixture scale on its own
        .join(t1, "user_id")
        .filter(F.col("ts_us") > F.col("us1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("us2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts_us") > F.col("us2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("us3"))
    )
    stages = [("1_view", t1), ("2_click", t2), ("3_purchase", t3)]
    frames = [
        t.agg(F.count("*").cast("bigint").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )
        for name, t in stages
    ]
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionAll(f_)
    return out.orderBy("stage")


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) // 7
               AS cohort_w
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id,
             DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
      FROM events
    ),
    sizes AS (
      SELECT cohort_w, CAST(COUNT(*) AS BIGINT) AS cohort_n
      FROM firsts GROUP BY 1
    )
    SELECT f.cohort_w,
           a.w - f.cohort_w AS offset_w,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users,
           CAST(FLOOR(10000.0 * COUNT(DISTINCT a.user_id)
                      / CAST(MIN(s.cohort_n) AS DOUBLE)) AS BIGINT)
             AS retention_bps
    FROM activity a
    JOIN firsts f USING (user_id)
    JOIN sizes s ON s.cohort_w = f.cohort_w
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week (anchored at
    the corpus epoch 2024-01-01), then for each (cohort, week-offset)
    cell the share of the cohort still active. The per-WEEK size frame
    is bounded by wall-clock and broadcasts; the per-user firsts frame
    is unbounded in users so its join carries no hint (AQE broadcasts it
    while it fits); the only full-data shuffles are the two user-keyed
    aggregates.

    Scale (100 TB): the activity DISTINCT is the dominant shuffle and is
    exactly one pass; a 52×52 retention triangle never needs the raw
    events again once (user, week) is materialized."""
    day0 = F.lit("2024-01-01").cast("date")
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        (F.datediff(F.col("ts").cast("date"), day0) / 7)
        .cast("bigint")
        .alias("w"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    activity = ev.distinct()
    sizes = firsts.groupBy("cohort_w").agg(F.count("*").cast("bigint").alias("cohort_n"))
    return (
        # firsts is per-user (unbounded) — no broadcast hint; sizes is
        # per-WEEK (bounded by wall-clock), safe to force
        activity.join(firsts, "user_id")
        .join(F.broadcast(sizes), "cohort_w")
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("offset_w"))
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("active_users"),
            # basis points via FLOOR, not ROUND: Spark rounds doubles
            # HALF_UP on the shortest repr, DuckDB on the true binary
            # value — floor of the identical double is engine-independent
            F.floor(
                10000.0 * F.count_distinct("user_id") / F.min("cohort_n").cast("double")
            )
            .cast("bigint")
            .alias("retention_bps"),
        )
        .orderBy("cohort_w", "offset_w")
    )


#: trailing-window size for the z-score detector (events strictly before
#: the current one) and the minimum history before a row may be flagged
ZSCORE_LOOKBACK = 20
ZSCORE_MIN_N = 10

#: the z-score detector's oracle — shared VERBATIM by the flat, bucketed,
#: and streaming (q108) variants: byte-identity of this string IS the
#: convergence contract between the three formulations
ZSCORE_ORACLE_SQL = f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             epoch_ns(ts) // 1000 AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_id, user_id, event_type, cents,
             COUNT(cents) OVER w AS n,
             COALESCE(SUM(cents) OVER w, 0) AS s,
             COALESCE(SUM(cents * cents) OVER w, 0) AS s2
      FROM ev
      WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
                   ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id, user_id, cents, CAST(n AS BIGINT) AS n
    FROM stats
    WHERE n >= {ZSCORE_MIN_N}
      AND (n * cents - s) * (n * cents - s) * (n - 1)
          > 9 * n * (n * s2 - s * s)
    ORDER BY event_type, event_id
    """


def zscore_flag_stats(frame, w):
    """The shared trailing-window statistics triple over window spec ``w``
    — three aggregates Spark evaluates in one WindowExec pass."""
    return (
        F.count("cents").over(w).alias("n"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(w), F.lit(0)).alias("s2"),
    )


def zscore_flag_filter():
    """The exact-integer 3-sigma test: (n*x - s)^2 (n-1) > 9 n (n*s2 - s^2),
    with the n >= ZSCORE_MIN_N history floor. The algebra runs WIDENED —
    DECIMAL(38,0) here, HUGEINT in the oracle (its window SUMs widen
    automatically): with bigint terms, 9·n·(n·s2 − s²) crosses 2^63 at
    cents ≈ 1.1e7 (~$113k values) and Spark (ANSI) would abort where
    DuckDB returns rows (review r8, the TWAP/Pareto overflow class).
    Both decimal and HUGEINT are exact integers to ~1e38, so the σ
    boundary stays engine-independent."""
    dec = "decimal(38,0)"
    x = F.col("cents").cast(dec)
    n = F.col("n").cast(dec)
    s, s2 = F.col("s").cast(dec), F.col("s2").cast(dec)
    return (F.col("n") >= ZSCORE_MIN_N) & (
        (n * x - s) * (n * x - s) * (n - 1) > F.lit(9) * n * (n * s2 - s * s)
    )



@query(
    "events_gapfill_locf",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             (epoch_ns(ts) // 1000000000 // 3600) * 3600 AS hour_s,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    hourly AS (
      SELECT user_id, hour_s, SUM(cents) AS cents FROM ev GROUP BY 1, 2
    ),
    b AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM ev),
    grid AS (
      SELECT u.user_id, g.hour_s
      FROM (SELECT DISTINCT user_id FROM ev) u
      CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, 3600)) AS hour_s
                  FROM b) g
    ),
    j AS (
      SELECT g.user_id, g.hour_s, h.cents
      FROM grid g LEFT JOIN hourly h USING (user_id, hour_s)
    )
    SELECT user_id,
           CAST(hour_s AS BIGINT) AS hour_s,
           CAST(COALESCE(
             LAST_VALUE(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hour_s
               ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS cents_filled,
           CAST(CASE WHEN cents IS NULL THEN 0 ELSE 1 END AS INT) AS observed
    FROM j ORDER BY user_id, hour_s
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid gap-fill with last-observation-carried-forward: per-user
    hourly spend, densified onto the corpus-wide hour grid, empty hours
    carrying the user's previous observed value (0 before their first).
    The grid is ``users × sequence(min_hour, max_hour)`` — the bounds
    frame is one row, so the crossJoin is a broadcast of two scalars, and
    the explode happens AFTER the per-user fan-out, so grid rows are born
    already partitioned by the user key the LOCF window needs.

    Scale (100 TB): the grid is users × hours — it grows with entities
    and wall-clock, not with event volume, so densification is CHEAPER
    relative to the raw stream as traffic grows. One shuffle keys
    everything by user_id (grid build, hourly agg join, LOCF window all
    reuse it). The LOCF idiom is ``last(x, ignorenulls=True)`` over rows
    UNBOUNDED PRECEDING — the standard backfill for feature stores /
    metric dashboards; no ``applyInPandas`` per user, no driver loop.
    """
    ev = _ev(spark, sf_dir).select(
        "user_id", F.expr("(ts_s DIV 3600) * 3600").alias("hour_s"), "cents"
    )
    hourly = ev.groupBy("user_id", "hour_s").agg(F.sum("cents").alias("cents"))
    # three consumers (bounds, user set, the grid join) would each re-run
    # the aggregate AND its event scan; materialize the aggregated frame
    # once (eager localCheckpoint — ContextCleaner-reclaimed, no pinned
    # cache). bounds and the user set derive from it: hourly preserves
    # exactly the observed users and hour range, so the raw event stream
    # is scanned once, not three times
    hourly = hourly.localCheckpoint(eager=True)
    bounds = hourly.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = (
        hourly.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_s"),
        )
    )
    j = grid.join(hourly, ["user_id", "hour_s"], "left")
    w = W.partitionBy("user_id").orderBy("hour_s").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        j.select(
            "user_id",
            F.col("hour_s").cast("bigint").alias("hour_s"),
            F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(0))
            .cast("bigint")
            .alias("cents_filled"),
            F.when(F.col("cents").isNull(), 0).otherwise(1).cast("int").alias("observed"),
        )
        .orderBy("user_id", "hour_s")
    )


def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window anomaly detection: flag an event whose value sits
    more than 3 sample standard deviations from the mean of the previous
    ≤20 same-type events. The test is done in EXACT integer algebra —
    ``(n·x − s)²·(n−1) > 9·n·(n·s² − s²)`` over integer cents — so the
    3σ boundary is engine-independent (a floating stddev_samp differs in
    the last ulp between Spark's and DuckDB's accumulators, and a
    boundary z≈3 row would flip; FIXTURES.md §3 forbids float filters).

    TEST-ONLY REFERENCE since r11 (VERDICT r10 #4): this flat form
    partitions the window by event_type alone, so at 100 TB one hot
    type's entire history lands in a single window partition — a
    scale-killer kept out of the manifest. The CANONICAL manifest entry
    is ``events_zscore_anomaly_bucketed`` (bit-identical output, same
    oracle, week-bucketed partitions); this function remains as the
    simple formulation the bucketed variant is equivalence-tested
    against (tests/test_zscore_bucketed.py). Three window aggregates
    share one frame, so Spark evaluates them in a single WindowExec
    pass — no triple scan.
    """
    ev = _ev(spark, sf_dir)
    w = (
        W.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    stats = ev.select(
        "event_type", "event_id", "user_id", "cents", *zscore_flag_stats(ev, w)
    )
    return (
        stats.filter(zscore_flag_filter())
        .select(
            "event_type",
            "event_id",
            "user_id",
            "cents",
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("event_type", "event_id")
    )


#: bucket width for the partition-bounded z-score variant (one week)
ZSCORE_BUCKET_US = 7 * 24 * 3600 * 1_000_000


@query(
    "events_zscore_anomaly_bucketed",
    # IDENTICAL oracle to events_zscore_anomaly — same string object: the
    # bucketing is a pure execution-strategy change (the
    # dedup_ngram_jaccard_capped pattern; the scale variant must
    # reproduce the flat formulation bit-for-bit)
    oracle=ZSCORE_ORACLE_SQL,
)
def events_zscore_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-bounded z-score anomaly detection — the CANONICAL
    anomaly entry since r11. Same semantics and the SAME oracle as the
    test-only flat reference (:func:`events_zscore`), but the window runs
    per (event_type, week bucket) instead of per event_type, so no
    partition outgrows a week of one type's traffic (the flat form caps
    parallelism at the number of event types — the documented 100 TB
    weakness that got it demoted from the manifest, VERDICT r10 #4).

    Exactness across bucket boundaries: each bucket receives CARRY rows —
    the 20 most recent events of the type's PREFIX (all earlier buckets).
    Carries sort before every real row of their bucket (strictly earlier
    timestamps), so the j-th real row's trailing-20 frame is its j−1
    in-bucket predecessors plus the 21−j most recent prefix rows — exactly
    the global trailing window. Carries provide context only (emit=0).
    The carry frame is tiny by construction: per-bucket tails are ≤20 rows
    each (a window over the already-bounded bucket partitions), and the
    prefix-last-20 selection runs on that types×buckets×20 mini-frame.
    """
    ev = _ev(spark, sf_dir).withColumn(
        "bucket", F.expr(f"ts_us DIV {ZSCORE_BUCKET_US}")
    )
    # ≤20-row tail of each (type, bucket): candidates for any later bucket's carry
    wtail = W.partitionBy("event_type", "bucket").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    tails = (
        ev.withColumn("rn_desc", F.row_number().over(wtail))
        .filter(F.col("rn_desc") <= ZSCORE_LOOKBACK)
        .drop("rn_desc")
    )
    # every non-empty (type, bucket) has a tail row, so the bucket list
    # derives from the tiny tails frame — no third scan of the stream
    buckets = tails.select("event_type", "bucket").distinct()
    # for each target bucket: the 20 most recent rows across ALL earlier
    # buckets (sparse buckets mean the prefix tail can span several)
    wcarry = W.partitionBy("event_type", F.col("tb")).orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    carries = (
        tails.join(
            buckets.select("event_type", F.col("bucket").alias("tb")),
            "event_type",
        )
        .filter(F.col("bucket") < F.col("tb"))
        .withColumn("rn", F.row_number().over(wcarry))
        .filter(F.col("rn") <= ZSCORE_LOOKBACK)
        .select(
            "event_type",
            F.col("tb").alias("bucket"),
            "event_id",
            "user_id",
            "ts_us",
            "cents",
            F.lit(0).alias("emit"),
        )
    )
    union = ev.select(
        "event_type", "bucket", "event_id", "user_id", "ts_us", "cents",
        F.lit(1).alias("emit"),
    ).unionByName(carries)
    w = (
        W.partitionBy("event_type", "bucket")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    stats = union.select(
        "event_type",
        "event_id",
        "user_id",
        "cents",
        "emit",
        *zscore_flag_stats(union, w),
    )
    return (
        stats.filter((F.col("emit") == 1) & zscore_flag_filter())
        .select(
            "event_type",
            "event_id",
            "user_id",
            "cents",
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("event_type", "event_id")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_ns(ts) // 1000 AS ts_us, event_id
      FROM events
    ),
    hops AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS dst
      FROM ev
    ),
    t AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM hops WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, SUM(n) AS n_src FROM t GROUP BY 1)
    SELECT t.src, t.dst, t.n,
           CAST((t.n * 10000) // tot.n_src AS BIGINT) AS p_bps
    FROM t JOIN tot USING (src)
    ORDER BY src, dst
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    consecutive (src → dst) event-type hops via a LEAD window keyed by
    user, counted globally, with the conditional probability in integer
    basis points (``(n·10000) DIV n_src`` — exact on both engines). This
    is the session-model / next-action-prediction primitive behind
    behavioral cohorting.

    Scale (100 TB): one user-keyed window shuffle (high-cardinality key,
    spreads across executors — same layout the sessionizer uses, so a
    combined pipeline would reuse one exchange), then a types×types
    aggregate that partial-combines map-side into a frame the size of
    the type vocabulary squared. The per-src totals frame is tiny and
    broadcast-joins back onto the transition counts."""
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = hops.groupBy("src", "dst").agg(F.count("*").cast("bigint").alias("n"))
    # per-src totals as a window over the types^2 aggregated frame — one
    # lineage, one event scan (a tot-branch broadcast join would re-run
    # the window + aggregate just to sum 25 rows)
    return (
        t.withColumn("n_src", F.sum("n").over(W.partitionBy("src")))
        .select(
            "src",
            "dst",
            "n",
            F.expr("(n * 10000) DIV n_src").cast("bigint").alias("p_bps"),
        )
        .orderBy("src", "dst")
    )


@query(
    "events_twap_per_user",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id,
             epoch_ns(ts) // 1000 AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    hold AS (
      SELECT user_id, cents,
             LEAD(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) - ts_us AS dur_us
      FROM ev
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS held_us,
           CAST(SUM(CAST(cents AS HUGEINT) * dur_us) // SUM(dur_us) AS BIGINT)
             AS twap_cents
    FROM hold WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id ORDER BY user_id
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's value holds
    until the user's next event; TWAP = Σ(value·duration) / Σ(duration),
    computed entirely in exact integers: the product SUM runs widened
    (DECIMAL(38,0) on Spark, HUGEINT on DuckDB — a bigint sum would
    overflow for a long-span high-value user on Spark while DuckDB
    silently widens, review r8) and the final ratio is truncating
    integer division, identical on both engines. The metrics/finance backfill shape: a plain AVG
    over-weights bursty periods; TWAP is what monitoring and OHLC
    pipelines actually report.

    Scale (100 TB): one user-keyed window (LEAD) feeding a user-keyed
    aggregate — Catalyst reuses the single exchange; zero-duration
    intervals (duplicate timestamps) drop out identically on both
    engines via ``dur_us > 0``."""
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    hold = ev.select(
        "user_id",
        "cents",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return (
        hold.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("held_us"),
            # the per-user SUM of products needs widening, not just the
            # per-interval product (review r8): a long-span high-value
            # user overflows sum(bigint) on Spark while DuckDB widens to
            # HUGEINT — DECIMAL(38,0) keeps both engines exact
            F.expr(
                "sum(CAST(cents AS DECIMAL(38,0)) * dur_us) DIV sum(dur_us)"
            )
            .cast("bigint")
            .alias("twap_cents"),
        )
        .orderBy("user_id")
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             epoch_ns(ts) // 1000 AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    attributed AS (
      SELECT user_id, event_id, event_type, cents,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM ev
    )
    SELECT COALESCE(channel, '(none)') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM attributed WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent NON-purchase event type before it (purchases never credit
    themselves or earlier purchases — the CASE inside the
    ignore-nulls LAST_VALUE skips them); purchases with no prior
    touch land in '(none)'. The marketing-analytics primitive behind
    channel ROI tables.

    Scale (100 TB): one user-keyed window over the full stream, then a
    channels-sized aggregate; the window evaluates the conditional
    last_value in the same pass that the sessionizer/Markov entries use,
    so a combined pipeline shares the exchange. Exact integer cents."""
    ev = _ev(spark, sf_dir).select("user_id", "event_id", "event_type", "ts_us", "cents")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    attributed = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("(none)")).alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
        .orderBy("channel")
    )
