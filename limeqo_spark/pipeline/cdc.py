"""Changelog compaction (CDC upsert): collapse a keyed change stream to the
latest surviving row per key — the ingest primitive every incremental
training-data pipeline needs (upsert + delete tombstones) before any
dedup/analysis pass. Beyond-reference north-star surface, same family as
`pipeline.dedup`.

Scale design: the latest-wins reduction is an **aggregate** (`max_by` over a
monotone version struct), not a ranking window — aggregates get map-side
partial combine, so each executor first collapses its local slice of a hot
key and only pre-reduced rows shuffle. A `row_number` window over the same
key would shuffle every change row and sort whole partitions. Tombstone
filtering happens after the reduce, on one row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query

#: event_type acting as the delete tombstone in the events-as-changelog view
TOMBSTONE = "error"


def upsert_latest(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    payload_cols: list[str],
    delete_when=None,
) -> DataFrame:
    """Compact ``changes`` to the latest row per key: for each key (by
    ``key_cols``), keep the payload of the row with the greatest
    ``seq_cols`` tuple (total order — include a unique tie-break column);
    if ``delete_when`` (a Column predicate over the surviving payload) is
    true, the key was tombstoned and is dropped from the snapshot.
    """
    latest = changes.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("__last")
    )
    out = latest.select(*key_cols, "__last.*")
    if delete_when is not None:
        out = out.where(~delete_when)
    return out


@query(
    "cdc_upsert_latest",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, "value",
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_type,
           CAST(ROUND("value" * 100) AS BIGINT) AS last_value_cents
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
)
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events as a per-user changelog: the snapshot keeps each user's
    latest event (ordered by microsecond timestamp, event_id tie-break),
    dropping users whose final event is the 'error' tombstone. The oracle
    states the same semantics as a ranking window; our plan is the
    partial-aggregatable max_by reduction (see module docstring)."""
    ev = table(spark, sf_dir, "events")
    # Order by the timestamp column itself, not unix_micros(ts): the fixture
    # parquet stores ts without timezone, which Spark reads as TIMESTAMP_NTZ,
    # and unix_micros only accepts TIMESTAMP. Struct comparison orders both
    # timestamp types correctly and keeps the aggregate partial-combinable.
    snap = upsert_latest(
        ev,
        key_cols=["user_id"],
        seq_cols=["ts", "event_id"],
        payload_cols=["event_type", "value"],
        delete_when=F.col("event_type") == TOMBSTONE,
    )
    return snap.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.round(F.col("value") * 100).cast("bigint").alias("last_value_cents"),
    ).orderBy("user_id")


@query(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id,
           epoch_ns(ts) // 1000 AS valid_from_us,
           LEAD(epoch_ns(ts) // 1000) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
           ) AS valid_to_us,
           CAST(ROUND("value" * 100) AS BIGINT) AS value_cents,
           LEAD(epoch_ns(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
           ) IS NULL AS is_current
    FROM events WHERE event_type = 'purchase'
    ORDER BY user_id, valid_from_us, value_cents
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: turn a keyed change stream (each purchase
    sets the user's current value) into validity-interval rows — the other
    half of the CDC story next to `cdc_upsert_latest` (snapshot = latest;
    SCD2 = full history with [valid_from, valid_to) intervals and an
    is_current flag). One LEAD window partitioned by the high-cardinality
    key: each key's history sorts locally within its hash partition, no
    global sort, no self-join (the naive formulation joins the stream to
    itself on 'next change per key'). Timestamps leave as epoch
    microseconds (fixture ts is TIMESTAMP_NTZ; `epoch_us` pins UTC)."""
    from pyspark.sql import Window

    from limeqo_spark.io import epoch_us

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(epoch_us("ts"), "event_id")
    nxt = F.lead(epoch_us("ts")).over(w)
    return (
        ev.select(
            "user_id",
            epoch_us("ts").alias("valid_from_us"),
            nxt.alias("valid_to_us"),
            F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us", "value_cents")
    )


def merge_apply(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_col: str,
    part_col: str,
) -> None:
    """Apply a full-row MERGE (upsert + delete) to a parquet table
    partitioned by ``part_col``, copy-on-write at PARTITION granularity:
    only partitions named in the changelog are read back, rebuilt
    ((current rows anti-join changed keys) UNION surviving change rows)
    and rewritten under ``partitionOverwriteMode=dynamic`` — untouched
    partitions' files are never listed, read, or replaced (the lakehouse
    MERGE INTO pattern on plain parquet). ``changes`` carries full
    payload rows plus an ``op`` column ('U'/'I' upsert, 'D' delete).

    Known limitations (documented, not hit here):

    - a partition whose every row is deleted produces no rows in the
      rebuilt frame, so dynamic overwrite leaves its old files in place —
      full-partition deletes need an explicit directory drop;
    - ``part_col`` must be NON-NULL on every change row (a NULL lands in
      the NULL partition bucket and the change is silently skipped) and
      the key→partition mapping must be STABLE: affected partitions are
      derived from the changelog's ``part_col`` values only, so an update
      that moves a key to a different partition must be expressed as an
      explicit delete (old partition value) + insert (new partition
      value), else the stale copy in the old partition survives. Deriving
      affected partitions from the current rows matching changed keys
      would read every partition and defeat the pruning this function
      exists for.
    """
    affected = changes.select(part_col).distinct()
    cur = spark.read.parquet(path).join(F.broadcast(affected), part_col, "left_semi")
    rebuilt = cur.join(
        changes.select(key_col).distinct(), key_col, "left_anti"
    ).unionByName(changes.filter(F.col("op") != "D").drop("op"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rebuilt.write.mode("overwrite").partitionBy(part_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p, o_orderstatus
  FROM orders
),
dels AS (
  SELECT o_orderkey FROM base
  WHERE o_orderkey % 101 = 0 AND o_orderstatus <> 'P'
),
upds AS (
  SELECT o_orderkey FROM base
  WHERE o_orderkey % 97 = 0 AND o_orderstatus <> 'P'
),
ins AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
         p + 5000.00 AS p, o_orderstatus
  FROM base WHERE o_orderkey % 103 = 0 AND o_orderstatus <> 'P'
),
final AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey IN (SELECT o_orderkey FROM upds)
              THEN p + 1000.00 ELSE p END AS p,
         o_orderstatus
  FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels)
  UNION ALL
  SELECT * FROM ins
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(p * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM final
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("cdc_merge_apply", oracle=_MERGE_ORACLE)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on plain parquet: stage orders partitioned by
    ``o_orderstatus``, synthesize a deterministic changelog touching only
    the 'O'/'F' partitions (updates: keys % 97, +1000.00; deletes:
    keys % 101; inserts: keys % 103 cloned to key+10M at +5000.00), apply
    it copy-on-write via :func:`merge_apply`, and emit integer-exact
    per-partition digests of the FINAL table state (count, cents sum, key
    sum/min/max) — the oracle computes the expected post-merge state from
    the original parquet with the same rules, so the whole
    read-merge-rewrite-reread cycle is hash-verified. Deletes win over
    updates on key collisions (%9797) on both sides.

    Scale: the changelog's partition set broadcasts into a semi-join, so
    ONLY affected partitions are read and rewritten (q46-style pruning on
    the way in, q91-style dynamic overwrite on the way out); the
    untouched 'P' partition's files are never listed or replaced
    (file-identity asserted in tests). All money arithmetic goes through
    DECIMAL(18,2)/integer cents — no float drift across the engines.
    """
    from limeqo_spark.io import scratch_dir

    out = scratch_dir(prefix="limeqo_merge_")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        "o_orderstatus",
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    live = F.col("o_orderstatus") != "P"
    # decimal addition widens (18,2)+(18,2) -> (19,2); cast back so the
    # rewritten partitions keep the target's declared column type
    upd = (
        o.filter(live & (F.col("o_orderkey") % 97 == 0))
        .withColumn(
            "p",
            (F.col("p") + F.lit(1000.00).cast("decimal(18,2)")).cast("decimal(18,2)"),
        )
        .withColumn("op", F.lit("U"))
    )
    del_ = o.filter(live & (F.col("o_orderkey") % 101 == 0)).withColumn(
        "op", F.lit("D")
    )
    ins = (
        o.filter(live & (F.col("o_orderkey") % 103 == 0))
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn(
            "p",
            (F.col("p") + F.lit(5000.00).cast("decimal(18,2)")).cast("decimal(18,2)"),
        )
        .withColumn("op", F.lit("I"))
    )
    # deletes win over updates on %9797 collisions: drop those update rows
    changes = (
        upd.join(del_.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(del_)
        .unionByName(ins)
    )
    merge_apply(spark, out, changes, key_col="o_orderkey", part_col="o_orderstatus")

    back = spark.read.parquet(out)
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


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_col: str, payload_cols: list[str]
) -> DataFrame:
    """Derive the MERGE changelog from two snapshots: one full outer join
    on ``key_col`` classifies every row as I (new only), D (old only) or
    U (both sides, any payload column differs NULL-SAFELY), unchanged rows
    dropped. I/U rows carry the NEW payload; D rows carry the OLD payload,
    so a delete names its (old) partition value and the returned frame is
    exactly the ``op`` frame :func:`merge_apply` consumes —
    ``merge_apply(path_of_old, snapshot_diff(old, new), ...)`` reproduces
    ``new`` (partition-stable keys assumed; see :func:`merge_apply`).
    Composability is pinned by
    ``tests/test_profile_vocab.py::test_snapshot_diff_applied_via_merge_reproduces_new``.
    """
    o, n = old.alias("o"), new.alias("n")
    ok, nk = F.col(f"o.{key_col}"), F.col(f"n.{key_col}")
    changed = ok.isNull() | nk.isNull()
    for c in payload_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    is_del = nk.isNull()
    sel = [
        F.coalesce(ok, nk).alias(key_col),
        F.when(ok.isNull(), "I").when(is_del, "D").otherwise("U").alias("op"),
    ]
    for c in payload_cols:
        sel.append(F.when(is_del, F.col(f"o.{c}")).otherwise(F.col(f"n.{c}")).alias(c))
    return o.join(n, ok == nk, "full_outer").filter(changed).select(*sel)


_SNAPDIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey AS k, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
),
new AS (
  -- deterministic second snapshot: keys %89 repriced, %113 dropped,
  -- %127 cloned to key+20M
  SELECT k, o_custkey,
         CASE WHEN k % 89 = 0 THEN p + 777.00 ELSE p END AS p
  FROM old WHERE k % 113 <> 0
  UNION ALL
  SELECT k + 20000000, o_custkey, p + 99.00 FROM old WHERE k % 127 = 0
),
diff AS (
  SELECT COALESCE(o.k, n.k) AS k,
         CASE WHEN o.k IS NULL THEN 'I'
              WHEN n.k IS NULL THEN 'D'
              ELSE 'U' END AS op,
         CASE WHEN n.k IS NULL THEN o.o_custkey ELSE n.o_custkey END
           AS o_custkey,
         CASE WHEN n.k IS NULL THEN o.p ELSE n.p END AS p
  FROM old o FULL OUTER JOIN new n ON o.k = n.k
  WHERE o.k IS NULL OR n.k IS NULL
     OR o.o_custkey IS DISTINCT FROM n.o_custkey
     OR o.p IS DISTINCT FROM n.p
)
SELECT op, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_keys,
       CAST(SUM(CAST(COALESCE(p, 0) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
FROM diff
GROUP BY op
ORDER BY op
"""


@query("cdc_snapshot_diff", oracle=_SNAPDIFF_ORACLE)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a changelog FROM two table snapshots — the inverse of
    :func:`merge_apply` and the standard recovery path when a source
    can't emit CDC: one full outer join on the key classifies every row
    as INSERT (new only), DELETE (old only), or UPDATE (both sides, any
    payload column differs, null-safely — ``IS DISTINCT FROM`` /
    ``eqNullSafe`` so NULL↔value flips are detected), unchanged rows
    dropped. I/U rows carry the NEW payload; D rows carry the OLD payload
    — deletes must name their (old) partition value or a downstream
    :func:`merge_apply` keyed on a payload partition column would bucket
    them under NULL and silently skip them. With that, the frame is
    exactly the ``op`` frame ``merge_apply`` consumes: diff(old, new)
    applied to old reproduces new (assuming partition-stable keys, see
    :func:`merge_apply`).

    Scale: one key-partitioned shuffle join of the two snapshots (the
    payload comparison is a JVM-side predicate; at a real lake you'd
    bucket both snapshots by key to make the diff shuffle-free, the q51
    layout). Output digests are integer cents/keys per op class.
    """
    old = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    new = (
        old.filter(F.col("k") % 113 != 0)
        .withColumn(
            "p",
            F.when(F.col("k") % 89 == 0, F.col("p") + F.lit(777.00).cast("decimal(18,2)")).otherwise(
                F.col("p")
            ),
        )
        .unionByName(
            old.filter(F.col("k") % 127 == 0).select(
                (F.col("k") + 20_000_000).alias("k"),
                "o_custkey",
                (F.col("p") + F.lit(99.00).cast("decimal(18,2)")).alias("p"),
            )
        )
    )
    diff = snapshot_diff(old, new, key_col="k", payload_cols=["o_custkey", "p"])
    return (
        diff.groupBy("op")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum((F.coalesce(F.col("p"), F.lit(0).cast("decimal(18,2)")) * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("op")
    )
