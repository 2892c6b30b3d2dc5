"""Streaming manifest queries (q44a-d): each builder actually RUNS a
Structured Streaming query over the events fixture (file source -> memory
sink, driven to completion synchronously) and returns the result DataFrame,
so the correctness gate exercises real streaming execution, with the DuckDB
oracle computing the batch-equivalent bucketing.

Watermark finalization gotcha: append-mode output only emits when the
watermark passes a window's end, and the watermark only advances on a
*subsequent* batch. Queries needing finalization stage the real events as
one file and a far-future sentinel row as a second file with
maxFilesPerTrigger=1, so batch 2 pushes the watermark past every real
window; sentinel rows are filtered from results.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from limeqo_spark.io import scratch_dir, table
from limeqo_spark.pipeline.corpus import PLANT_N, PLANT_OFFSET, PLANT_SUFFIX
from limeqo_spark.relational.queries_events import ZSCORE_ORACLE_SQL
from limeqo_spark.relational.registry import query, raise_on_failed_gates

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
SENTINEL_USER = -999


_STAGE_CACHE: dict[tuple[str, bool], str] = {}


def _stamp_batch_order(stage: str) -> None:
    """Make micro-batch arrival order a CONTRACT, not a race:
    FileStreamSource orders files by modification time (ties by listing),
    so coarse-mtime filesystems or interleaved writes could reorder the
    staged batches. Stamp every file under ``batch<i>`` with a strictly
    increasing mtime per batch directory (sorted by name) so batch0's
    files always precede batch1's regardless of write timing."""
    base = 1_000_000_000  # fixed epoch well in the past; only order matters
    for i, d in enumerate(
        sorted(
            e for e in os.listdir(stage)
            if e.startswith("batch") and os.path.isdir(os.path.join(stage, e))
        )
    ):
        t = base + i * 1000
        for root, _dirs, files in os.walk(os.path.join(stage, d)):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))


def _stage_events(spark: SparkSession, sf_dir: str, with_sentinel: bool = False) -> str:
    """Materialize events (ts normalized to a proper timestamp) into a fresh
    directory usable as a file-stream source; optionally add a far-future
    sentinel file that drives the watermark past all real data. Staged dirs
    are immutable once written, so they are memoized per (sf_dir, sentinel)
    within the process — four streaming queries otherwise re-write the same
    parquet."""
    key = (sf_dir, with_sentinel)
    cached = _STAGE_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    stage = scratch_dir(prefix="limeqo_stream_")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "batch0"))
    if with_sentinel:
        # interval arithmetic, not cast-to-long: it preserves the source ts
        # type (TIMESTAMP or TIMESTAMP_NTZ, depending on fixture vintage),
        # and NTZ refuses a bigint cast outright
        far = ev.agg(F.max("ts").alias("m")).select(
            F.lit(-1).cast("bigint").alias("event_id"),
            (F.col("m") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
            F.lit(SENTINEL_USER).cast("bigint").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        far.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "batch1"))
    _stamp_batch_order(stage)
    _STAGE_CACHE[key] = stage
    return stage


#: state-store partition count for the streaming queries (opt r11).
#: ``spark.sql.shuffle.partitions`` at a stream's FIRST micro-batch fixes
#: its number of state-store instances for the checkpoint's lifetime, and
#: every instance pays a per-batch commit (delta file + fsync) whether or
#: not it holds keys — 32 stores for a few hundred (window, type) keys
#: measured 1.6 s/query vs 1.0 s at 8. Sizing by STATE CARDINALITY is the
#: production rule too: the upstream partial aggregation collapses each
#: micro-batch to ~distinct-keys rows before this exchange regardless of
#: input volume, so reduce-side parallelism beyond the key count buys
#: nothing at any scale. Env-overridable for deployments whose key space
#: (sessions, users) genuinely needs more stores.
_STREAM_STATE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))


class _skip_nodata_batches:
    """Scoped ``spark.sql.streaming.noDataMicroBatches.enabled=false``.
    Complete-mode sinks re-emit the full state every batch and have no
    watermark-finalization dependency, so the trailing no-data micro-batch
    is pure latency (one extra batch plan + state commit + sink rewrite
    per query — opt r11 measured it on q44a; opt r12 extends the skip to
    EVERY complete-mode run per VERDICT r11 #4). Append/update-mode
    queries keep the default: their emission depends on watermark-
    advancing batches (q44c/d sentinel finalization, state timeouts)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._key = "spark.sql.streaming.noDataMicroBatches.enabled"

    def __enter__(self):
        self._prev = self._spark.conf.get(self._key, "true")
        self._spark.conf.set(self._key, "false")

    def __exit__(self, *exc):
        self._spark.conf.set(self._key, self._prev)


def _run_stream(agg: DataFrame, mode: str) -> DataFrame:
    """Drive a streaming aggregation to completion via a memory sink.
    Scopes ``spark.sql.shuffle.partitions`` to the state-store sizing
    documented at :data:`_STREAM_STATE_PARTITIONS` for the duration of
    the run (each invocation starts a FRESH checkpoint, so the sizing is
    free to differ from the batch session's shuffle partitioning).
    Complete-mode runs additionally skip the trailing no-data micro-batch
    (see :class:`_skip_nodata_batches`)."""
    name = f"limeqo_stream_{uuid.uuid4().hex[:10]}"
    sess = agg.sparkSession
    part_key = "spark.sql.shuffle.partitions"
    prev_parts = sess.conf.get(part_key)
    sess.conf.set(part_key, str(_STREAM_STATE_PARTITIONS))
    import contextlib

    nodata = _skip_nodata_batches(sess) if mode == "complete" else contextlib.nullcontext()
    try:
        with nodata:
            q = (
                agg.writeStream.outputMode(mode)
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        sess.conf.set(part_key, prev_parts)
    spark = agg.sparkSession
    # copy the sink rows out (eager localCheckpoint, ContextCleaner-
    # reclaimed) and DROP the uuid-named memory sink: every invocation
    # otherwise pins a full result set in driver memory for the session
    # lifetime — the retain()/release leak class, review r8
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def _sorted_single_slice(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic output order WITHOUT a global sort (opt r12, the
    cluster.py r11 idiom): ``orderBy`` on these tiny frames pays a range-
    partition SAMPLING job plus an exchange; a coalesce(1) +
    sortWithinPartitions is one task and produces the identical order
    because the sort keys are each entry's full grouping key (unique —
    the oracle hash compare already requires a deterministic total
    order). Only applied where the output is bounded by KEY CARDINALITY
    at any input volume (time windows x event types, market segments) —
    per-user/per-session outputs keep the distributed sort."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def _read_stream(spark: SparkSession, stage: str, one_file_per_batch: bool = False):
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if one_file_per_batch:
        r = r.option("maxFilesPerTrigger", 1)
    return r.option("recursiveFileLookup", "true").parquet(stage)


@query(
    "q44a_stream_tumbling",
    oracle="""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q44a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44 tumbling-window streaming aggregation == batch hour bucketing.
    Complete-mode memory sink (no finalization dependency); watermark
    present as it would be in production."""
    stage = _stage_events(spark, sf_dir)
    stream = _read_stream(spark, stage)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("long").alias("ws"), "event_type", "n")
    )
    # the no-data micro-batch skip moved into _run_stream (opt r12): every
    # complete-mode run gets it, not just this one.
    return _sorted_single_slice(_run_stream(agg, "complete"), "ws", "event_type")


@query(
    "q44b_stream_sliding",
    oracle="""
    WITH g AS (
      SELECT CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT) AS slot, event_type
      FROM events
    ),
    expanded AS (
      SELECT slot AS ws, event_type FROM g
      UNION ALL
      SELECT slot - 1800 AS ws, event_type FROM g
    )
    SELECT ws, event_type, COUNT(*) AS n
    FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q44b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44 sliding window (1 h / 30 min): every event lands in exactly two
    epoch-aligned windows; oracle expands each event to both starts."""
    stage = _stage_events(spark, sf_dir)
    stream = _read_stream(spark, stage)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("long").alias("ws"), "event_type", "n")
    )
    return _sorted_single_slice(_run_stream(agg, "complete"), "ws", "event_type")


@query(
    "q44c_stream_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       >= 900 THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    islands AS (
      SELECT user_id, ts,
             -- event_id tiebreak: without it the running SUM's frame is
             -- nondeterministic on duplicate (user, ts) pairs and a
             -- session-opening row could swap with its follower (review r8)
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM ordered
    )
    SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, grp ORDER BY user_id, session_start
    """,
)
def q44c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45 session windows (15 min gap) per user == batch gaps-and-islands.
    Append mode + watermark; a sentinel second batch advances the watermark
    so every real session finalizes (see module docstring)."""
    stage = _stage_events(spark, sf_dir, with_sentinel=True)
    stream = _read_stream(spark, stage, one_file_per_batch=True)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )
    out = _run_stream(agg, "append")
    return out.filter(F.col("user_id") != SENTINEL_USER).orderBy(
        "user_id", "session_start"
    )


@query("q44d_stream_dedup_watermark", oracle=None, check="prop")
def q44d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46 watermarked stateful dedup: replay events with planted duplicate
    event_ids (every id < 500 sent twice); dropDuplicatesWithinWatermark
    keeps exactly one row per id. Returns (n_input, n_survivors, n_expected,
    ok) — PROP: survivors == distinct ids."""
    stage = scratch_dir(prefix="limeqo_stream_dd_")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    dups = ev.filter(F.col("event_id") < 500)
    # originals and duplicates arrive in SEPARATE micro-batches (stamped
    # mtimes + maxFilesPerTrigger=1): single-batch staging degenerated
    # the operator to within-batch dedup, so a regression in cross-batch
    # watermark-scoped state could never fail this gate (review r8)
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "batch0"))
    dups.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "batch1"))
    _stamp_batch_order(stage)
    n_input = ev.count() + dups.count()
    n_expected = ev.select("event_id").distinct().count()

    stream = _read_stream(spark, stage, one_file_per_batch=True)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    n_surv = _run_stream(deduped, "append").count()
    out = spark.createDataFrame(
        [(n_input, n_surv, n_expected, n_surv == n_expected)],
        "n_input bigint, n_survivors bigint, n_expected bigint, ok boolean",
    )
    # a failed dedup must surface as a driver-visible err, not a silent
    # ok=false row the rows-only PROP check cannot see (review r8)
    return raise_on_failed_gates(out, "q44d_stream_dedup_watermark")


@query(
    "q45_stateful_user_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (SURVEY §1.4 extension; the mechanism SURVEY names for operators Spark
    lacks): per-user running totals carried in explicit GroupState across
    micro-batches. The stream is staged as multiple files with
    maxFilesPerTrigger=1 so state genuinely persists across batches; each
    update emits the current totals and the last emission per user equals
    the batch aggregate — which is exactly what the oracle checks.

    Money math in exact integer micros (decimal semantics): double
    accumulation across batch boundaries would drift vs the oracle.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # private stage (never the shared memoized one): two files so the
    # stateful operator genuinely carries state across >=2 micro-batches
    stage = scratch_dir(prefix="limeqo_stream_state_")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "s0")
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "s1")
    )

    stream = _read_stream(spark, stage, one_file_per_batch=True)

    def update_totals(key, pdfs, state: GroupState):
        n, micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            micros += int(round(pdf["value"].astype("float64").mul(1_000_000).round().sum()))
        state.update((n, micros))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_micros": [micros]}
        )

    updates = (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            outputStructType="user_id bigint, n_events bigint, total_micros bigint",
            stateStructType="n bigint, micros bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    emitted = _run_stream(updates, "update")
    # last emission per user = totals after the final batch
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("total_micros") / 1_000_000, 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q50_foreachbatch_sink",
    oracle="""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming -> durable sink via foreachBatch: the hourly aggregate is
    written per micro-batch to a parquet target in complete mode (each
    batch overwrites with the latest totals — the idempotent-sink pattern;
    at scale the same hook does MERGE INTO a lakehouse table). The check
    reads the SINK back, proving the sink contents — not just the in-memory
    result — match the batch oracle."""
    stage = _stage_events(spark, sf_dir)
    stream = _read_stream(spark, stage)
    sink = scratch_dir(prefix="limeqo_fb_sink_")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("ws"),
            "n",
            F.round(F.col("sum_value").cast("double"), 2).alias("total_value"),
        )
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(sink)

    # complete-mode foreachBatch: the trailing no-data batch would only
    # re-run write_batch with identical state (idempotent overwrite) —
    # skipping it drops a full sink rewrite (opt r12)
    with _skip_nodata_batches(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(write_batch)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return _sorted_single_slice(spark.read.parquet(sink), "ws")


@query(
    "q54_stream_stream_join",
    oracle="""
    SELECT a.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(epoch_ns(b.ts) // 1000 - epoch_ns(a.ts) // 1000) AS BIGINT)
               AS min_lag_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND epoch_ns(b.ts) // 1000 >= epoch_ns(a.ts) // 1000
     AND epoch_ns(b.ts) // 1000 <= epoch_ns(a.ts) // 1000 + 1800000000
    GROUP BY a.user_id ORDER BY a.user_id
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (the remaining Structured Streaming join
    surface): clicks joined to purchases by the same user within 30
    minutes, both sides watermarked so the join state is bounded — at
    100 TB/day the watermark is what keeps per-user join state from
    growing without bound. The streaming part is the join (append mode);
    the deterministic per-user rollup happens on the sink table. Oracle is
    the equivalent batch interval join at Spark's microsecond timestamp
    precision (the raw fixture carries TIMESTAMP_NANOS)."""
    stage = _stage_events(spark, sf_dir)
    clicks = (
        _read_stream(spark, stage)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
        .withWatermark("cts", "10 minutes")
    )
    purchases = (
        _read_stream(spark, stage)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .withWatermark("pts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr("cu = pu AND pts >= cts AND pts <= cts + interval 30 minutes"),
    ).select(
        F.col("cu").alias("user_id"),
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("lag_us"),
    )
    pairs = _run_stream(joined, "append")
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"), F.min("lag_us").alias("min_lag_us"))
        .orderBy("user_id")
    )


def _has_protobuf() -> bool:
    """transformWithState's Python state server speaks protobuf to the JVM;
    the worker hard-imports google.protobuf. Not shipped in this container,
    so the query registers only where the dependency exists (the builder
    itself is always importable and unit-tested for its plan shape)."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def _maybe_query(*args, **kw):
    if _has_protobuf():
        return query(*args, **kw)
    return lambda fn: fn


@_maybe_query(
    "q66_transform_with_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           ROUND(CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing via the Spark 4 transformWithState
    API (StatefulProcessor + typed state handles — the successor to
    applyInPandasWithState used by q45): per-user distinct event types in
    a MapState and the running max value in a ValueState, both persisted
    in the RocksDB state store across >=2 real micro-batches. Exposes the
    part of the new API the older one cannot express: multiple named,
    individually-typed state variables per key. Monotone outputs (distinct
    count and max only grow) make the final batch aggregate the fixture
    truth, which is exactly what the oracle computes."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTypeMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.mx = handle.getValueState("mx", "micros bigint")
            self.types = handle.getMapState("types", "t string", "one int")

        def handleInputRows(self, key, rows, timerValues):
            best = self.mx.get()[0] if self.mx.exists() else None
            for pdf in rows:
                for t in pdf["event_type"].unique():
                    self.types.updateValue((str(t),), (1,))
                m = int(round(pdf["value"].astype("float64").mul(1_000_000).max()))
                best = m if best is None else max(best, m)
            self.mx.update((best,))
            n_types = sum(1 for _ in self.types.keys())
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_types": [n_types], "max_micros": [best]}
            )

        def close(self) -> None:
            pass

    # private two-file stage so state genuinely crosses micro-batches
    stage = scratch_dir(prefix="limeqo_stream_tws_")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "s0")
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "s1")
    )
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _read_stream(spark, stage, one_file_per_batch=True)
        updates = (
            stream.select("user_id", "event_type", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserTypeMax(),
                outputStructType="user_id bigint, n_types bigint, max_micros bigint",
                outputMode="Update",
                timeMode="None",
            )
        )
        emitted = _run_stream(updates, "update")
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    # both outputs are monotone across batches: the max IS the final state
    return (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_types").alias("n_types"),
            F.round(F.max("max_micros") / 1_000_000, 2).alias("max_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q82_stream_static_enrich",
    oracle="""
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type IN ('purchase', 'click')
    GROUP BY c_mktsegment, event_type
    ORDER BY c_mktsegment, event_type
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the streaming events source joined to
    the STATIC customer dimension (the canonical streaming-ETL enrichment
    shape — Spark re-plans the static side per micro-batch, so dimension
    updates between batches are picked up without restarting the query).
    The dimension side broadcasts into each micro-batch; the aggregate is
    an unwindowed complete-mode group, so state is bounded by group
    cardinality (segments x types), not stream length. The oracle is the
    identical batch join."""
    stage = _stage_events(spark, sf_dir)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ev = _read_stream(spark, stage).filter(
        F.col("event_type").isin("purchase", "click")
    )
    agg = (
        ev.join(F.broadcast(c), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )
    return _sorted_single_slice(
        _run_stream(agg, "complete"), "c_mktsegment", "event_type"
    )


@query(
    "q86_stream_incremental_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET}, text || '{PLANT_SUFFIX}'
      FROM documents WHERE doc_id < {PLANT_N}
      UNION ALL
      -- wave-2 re-ingestion: the same docs arrive again byte-identical
      SELECT doc_id + {2 * PLANT_OFFSET}, text
      FROM documents WHERE doc_id < {PLANT_N}
    )
    SELECT MD5(text) AS h, MIN(doc_id) AS keep_doc
    FROM corpus GROUP BY h ORDER BY h
    """,
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the production continuous-pipeline
    pattern: documents arrive in micro-batches; each batch dedups within
    itself (min doc_id per digest, an aggregate), anti-joins the digest
    STORE accumulated from all prior batches, and appends only
    never-seen digests. Raw text never enters the store — 16-byte digests
    plus the keeper id. Batches are staged deterministically (originals
    before planted clones), so the final store must equal the batch
    keep-first dedup of the whole corpus, which is what the oracle
    computes. At scale the store is a lakehouse table and the anti-join a
    MERGE; the per-batch work is bounded by batch size x store lookup."""
    from limeqo_spark.pipeline.corpus import planted_corpus

    stage = scratch_dir(prefix="limeqo_incdedup_src_")
    store = scratch_dir(prefix="limeqo_incdedup_store_")
    corpus = planted_corpus(spark, sf_dir).select("doc_id", "text")
    # two deterministic arrival waves: originals first; then the tail, the
    # planted near-dup clones, AND a byte-identical re-ingestion of the
    # first 30 docs (doc_id+20000) — the wave-2 re-arrivals are the rows
    # the store anti-join must actually drop (keep_doc stays the wave-1
    # id), so first-seen == global min doc_id
    resent = (
        corpus.filter(F.col("doc_id") < PLANT_N)
        .select((F.col("doc_id") + 2 * PLANT_OFFSET).alias("doc_id"), "text")
    )
    corpus.filter(F.col("doc_id") < 250).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "batch0")
    )
    corpus.filter(F.col("doc_id") >= 250).unionByName(resent).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "batch1"))
    _stamp_batch_order(stage)
    # seed an empty store so the first batch's anti-join has a schema
    empty = spark.createDataFrame([], "h string, keep_doc bigint")
    empty.write.mode("overwrite").parquet(store)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        seen = s.read.parquet(store).select("h")
        fresh = (
            batch_df.select(F.md5("text").alias("h"), F.col("doc_id"))
            .groupBy("h")
            .agg(F.min("doc_id").alias("keep_doc"))
            .join(seen, "h", "left_anti")
        )
        fresh.write.mode("append").parquet(store)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(store).orderBy("h")


def _stream_minhash_oracle() -> str:
    """The batch MinHash-LSH oracle restricted to cross-wave pairs
    (original a < PLANT_OFFSET <= clone b) — exactly the pairs the
    streaming store-join can see when wave 0 lands before wave 1."""
    from limeqo_spark.pipeline.corpus import PLANT_OFFSET
    from limeqo_spark.pipeline.dedup import _minhash_oracle_sql

    sql = _minhash_oracle_sql()
    marker = "ORDER BY a, b"
    assert marker in sql
    return sql.replace(
        marker,
        f"AND a < {PLANT_OFFSET} AND b >= {PLANT_OFFSET} {marker}",
        1,
    )


@query("q96_stream_neardup_minhash", oracle=_stream_minhash_oracle())
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-duplicate detection — incremental MinHash-LSH: each
    micro-batch computes signatures for its documents, probes the durable
    band-key store accumulated from all prior batches (band key -> owner
    doc + its 16 signatures), verifies band hits with the full-signature
    match count (>= 8/16, est Jaccard >= 0.5), logs verified near-dups,
    and appends its own band keys to the store. Wave 0 = originals, wave
    1 = planted clones, so the dup log must equal the BATCH MinHash-LSH
    operator's output restricted to cross-wave pairs — the streaming
    variant is hash-verified against the same portable-minhash oracle as
    `dedup_minhash_lsh`, not just recall-tested.

    Scale: the store holds (4 band keys + 16 ints) per ingested doc —
    digests, never text; per batch the work is one signature groupBy over
    the batch and one band-key join against the store (a lakehouse table
    at scale; the join prunes to matching band hashes). State grows
    linearly in documents, queries in O(batch)."""
    from limeqo_spark.pipeline.corpus import PLANT_OFFSET, planted_corpus
    from limeqo_spark.pipeline.dedup import _MH_K, _MH_ROWS, minhash_band_rows

    stage = scratch_dir(prefix="limeqo_streammh_src_")
    store = scratch_dir(prefix="limeqo_streammh_store_")
    log = scratch_dir(prefix="limeqo_streammh_log_")
    corpus = planted_corpus(spark, sf_dir).select("doc_id", "text")
    corpus.filter(F.col("doc_id") < PLANT_OFFSET).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "batch0"))
    corpus.filter(F.col("doc_id") >= PLANT_OFFSET).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "batch1"))
    _stamp_batch_order(stage)
    sig_names = [f"s{i}" for i in range(_MH_K)]
    key_names = [f"k{r}" for r in range(_MH_ROWS)]
    empty_store = spark.createDataFrame(
        [],
        "band int, "
        + ", ".join(f"{k} bigint" for k in key_names)
        + ", owner bigint, "
        + ", ".join(f"o_{s} bigint" for s in sig_names),
    )
    empty_store.write.mode("overwrite").parquet(store)
    spark.createDataFrame([], "a bigint, b bigint, est_jaccard double").write.mode(
        "overwrite"
    ).parquet(log)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # shared with the batch operator (the parity contract depends on
        # byte-identical signatures/keys); persisted because two actions
        # consume it per batch (dup-log write + store append)
        bands = minhash_band_rows(batch_df).persist()
        try:
            _merge_batch_body(s, bands)
        finally:
            bands.unpersist()

    def _merge_batch_body(s, bands: DataFrame) -> None:
        seen = s.read.parquet(store)
        hits = bands.join(seen, ["band"] + key_names).select(
            F.col("owner").alias("a"),
            F.col("doc_id").alias("b"),
            *[F.col(f"o_{n}").alias(f"a_{n}") for n in sig_names],
            *[F.col(n).alias(f"b_{n}") for n in sig_names],
        ).distinct()
        m = None
        for n in sig_names:
            t = (F.col(f"a_{n}") == F.col(f"b_{n}")).cast("int")
            m = t if m is None else m + t
        verified = (
            hits.withColumn("m", m)
            .filter(F.col("m") >= _MH_K // 2)
            .select("a", "b", F.round(F.col("m") / float(_MH_K), 4).alias("est_jaccard"))
        )
        verified.write.mode("append").parquet(log)
        bands.select(
            "band",
            *key_names,
            F.col("doc_id").alias("owner"),
            *[F.col(n).alias(f"o_{n}") for n in sig_names],
        ).write.mode("append").parquet(store)

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(log).orderBy("a", "b")


def _smerge_oracle() -> str:
    from limeqo_spark.pipeline.cdc import _MERGE_ORACLE

    return _MERGE_ORACLE


@query("q105_stream_merge_apply", oracle=_smerge_oracle())
def q105_stream_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE INTO the lake: a changelog STREAM applied
    incrementally to a partitioned parquet table via foreachBatch +
    :func:`limeqo_spark.pipeline.cdc.merge_apply` — the standard
    structured-streaming upsert pattern (each micro-batch is one
    partition-granular copy-on-write merge). Two mtime-ordered waves
    arrive as separate micro-batches (``maxFilesPerTrigger=1``): wave 1
    carries the updates, wave 2 the deletes + inserts, exercising real
    SEQUENTIAL merge semantics (a key updated in batch 1 and deleted in
    batch 2 must end deleted).

    The changelog rules match ``cdc_merge_apply`` exactly, and sequential
    application is confluent with the one-shot delete-wins merge here, so
    this entry shares that operator's expected-state oracle — the driver
    hash-verifies that incremental streaming application converges to
    the identical final table state.

    Scale: per micro-batch cost is the affected-partition rewrite only;
    the stream's state is the TABLE itself (no Spark state store), which
    is what makes this the lakehouse pattern — restart recovery falls
    out of sink idempotence at the batch level.
    """
    from limeqo_spark.pipeline.cdc import merge_apply

    target = scratch_dir(prefix="limeqo_smerge_tbl_")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        "o_orderstatus",
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(target)

    live = F.col("o_orderstatus") != "P"
    # decimal addition widens (18,2)+(18,2) -> (19,2); cast back so the
    # staged parquet matches the stream reader's declared schema
    wave1 = (
        o.filter(live & (F.col("o_orderkey") % 97 == 0))
        .withColumn(
            "p",
            (F.col("p") + F.lit(1000.00).cast("decimal(18,2)")).cast("decimal(18,2)"),
        )
        .withColumn("op", F.lit("U"))
    )
    wave2 = (
        o.filter(live & (F.col("o_orderkey") % 101 == 0))
        .withColumn("op", F.lit("D"))
        .unionByName(
            o.filter(live & (F.col("o_orderkey") % 103 == 0))
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
            .withColumn(
                "p",
                (F.col("p") + F.lit(5000.00).cast("decimal(18,2)")).cast(
                    "decimal(18,2)"
                ),
            )
            .withColumn("op", F.lit("I"))
        )
    )
    stage = scratch_dir(prefix="limeqo_smerge_chg_")
    wave1.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "batch0"))
    wave2.coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "batch1"))
    _stamp_batch_order(stage)

    chg = (
        spark.readStream.schema(
            "o_orderkey bigint, o_custkey bigint, p decimal(18,2), "
            "o_orderstatus string, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )

    def apply_batch(bdf: DataFrame, _bid: int) -> None:
        if bdf.isEmpty():
            return
        merge_apply(spark, target, bdf, key_col="o_orderkey", part_col="o_orderstatus")

    q = (
        chg.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.parquet(target)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("p") * 100).cast("bigint")).cast("bigint").alias("sum_cents"),
            F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q108_stream_zscore_anomaly",
    # IDENTICAL oracle to the batch detector — same string object
    # (relational.queries_events.ZSCORE_ORACLE_SQL): the stream must
    # converge to exactly the batch answer once all batches are
    # processed, the strongest check a stateful operator can carry
    oracle=ZSCORE_ORACLE_SQL,
)
def q108_stream_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 3σ anomaly detection: the batch detector's exact trailing-
    20 window, carried across micro-batches as explicit GroupState (the
    last ≤20 (ts_us, event_id, cents) triples per event_type). The stream
    is staged as THREE time-tercile batches with maxFilesPerTrigger=1 and
    stamped mtimes, so the deque genuinely survives ≥2 state hand-offs and
    arrival order is a contract, not a filesystem race. Each batch sorts
    its group's rows by (ts_us, event_id) before replaying the recurrence
    in exact Python integers — no float ever touches the σ boundary — and
    the union of per-batch emissions must equal the BATCH oracle row set:
    the operator converges to the batch answer, the strongest property a
    stateful streaming port can claim.

    Scale: state is O(20) per event_type regardless of volume; a hot type
    bounds throughput at one task, the same limit the batch flat form has
    — the batch fix (week-bucket carries, events_zscore_anomaly_bucketed)
    has no streaming analog because state hand-off is inherently serial
    per key; shard-by-(type, user) approximations trade exactness."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stage = scratch_dir(prefix="limeqo_stream_zscore_")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # three batch writes would each re-run the scan + the global ntile
    # sort; materialize the terciled frame once and release it after
    # staging (staging is test plumbing — a real deployment's stream
    # arrives pre-batched)
    terc = ev.withColumn(
        "b", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    ).persist()
    try:
        for i in (1, 2, 3):
            terc.filter(F.col("b") == i).drop("b").coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(stage, f"batch{i - 1}"))
    finally:
        terc.unpersist()
    _stamp_batch_order(stage)

    stream = _read_stream(spark, stage, one_file_per_batch=True)

    # the SAME constants the shared oracle is built from — retuning the
    # batch detector must retune the streaming port with it (review r8)
    from limeqo_spark.relational.queries_events import ZSCORE_LOOKBACK as LOOKBACK
    from limeqo_spark.relational.queries_events import ZSCORE_MIN_N as MIN_N

    def detect(key, pdfs, state: GroupState):
        hist: list[tuple[int, int, int]] = (
            [tuple(t) for t in state.get[0]] if state.exists else []
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"])
        out_rows = []
        for eid, uid, ts_us, cents in zip(
            batch["event_id"], batch["user_id"], batch["ts_us"], batch["cents"]
        ):
            window = hist[-LOOKBACK:]
            n = len(window)
            if n >= MIN_N:
                s = sum(c for _, _, c in window)
                s2 = sum(c * c for _, _, c in window)
                x = int(cents)
                if (n * x - s) * (n * x - s) * (n - 1) > 9 * n * (n * s2 - s * s):
                    out_rows.append((key[0], int(eid), int(uid), x, n))
            hist.append((int(ts_us), int(eid), int(cents)))
            hist = hist[-LOOKBACK:]
        state.update(([list(t) for t in hist],))
        yield pd.DataFrame(
            out_rows, columns=["event_type", "event_id", "user_id", "cents", "n"]
        )

    prepared = stream.select(
        "event_type",
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    flagged = prepared.groupBy("event_type").applyInPandasWithState(
        detect,
        outputStructType="event_type string, event_id bigint, user_id bigint, cents bigint, n bigint",
        stateStructType="hist array<array<bigint>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_stream(flagged, "append")
    return emitted.select(
        "event_type", "event_id", "user_id", "cents", "n"
    ).orderBy("event_type", "event_id")
