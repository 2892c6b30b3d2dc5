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
