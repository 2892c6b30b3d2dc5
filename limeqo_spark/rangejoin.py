"""Binned range join: the 100 TB-safe plan for pure time-range joins.

A theta join with no equality key (``b.ts BETWEEN a.ts AND a.ts + gap``)
plans as BroadcastNestedLoopJoin / CartesianProduct in OSS Spark — an
M x N comparison that cannot ship at scale. Binning restores an equi-key:
bucket time into ``gap``-sized bins; a right row in bin k can only match
left rows in bins {k-1, k}, so replicating the left side into its bin and
its successor bin turns the range join into a hash/sort-merge equi-join on
the bin number followed by the exact range filter. Each candidate pair
carries exactly one matching bin replica, so no dedup pass is needed.

Cost model: candidates = sum over bins of |left_bin| * (|right_bin| +
|right_bin+1|) — linear in data for time-uniform streams, vs M x N for
the nested loop. The bin width IS the range width, which maximizes
selectivity of the post-filter while keeping exactly two replicas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BIN_COL = "__range_bin"


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: Column,
    right_ts: Column,
    gap_seconds: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner-join ``left`` x ``right`` on ``right_ts in (left_ts, left_ts +
    gap_seconds]`` without a nested-loop plan. Column names must be
    disjoint (rename before calling, as with ``skew.salted_join``).
    ``extra_cond`` adds predicates evaluated after the bin equi-join.
    """
    gap_us = int(gap_seconds * 1_000_000)
    lbin = F.floor(F.unix_micros(left_ts) / F.lit(gap_us))
    rbin = F.floor(F.unix_micros(right_ts) / F.lit(gap_us))
    # replicate left into its own bin and the next: a right row one bin
    # ahead can still be within gap of a late-in-bin left row
    lrep = left.withColumn(BIN_COL, F.explode(F.array(lbin, lbin + 1)))
    rrep = right.withColumn(BIN_COL, rbin)
    cond = (
        (lrep[BIN_COL] == rrep[BIN_COL])
        & (right_ts > left_ts)
        & (F.unix_micros(right_ts) <= F.unix_micros(left_ts) + F.lit(gap_us))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lrep.join(rrep, cond).drop(BIN_COL)
