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

from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from limeqo_spark.io import epoch_us
from pyspark.sql.types import StructType

BIN_COL = "__range_bin"
_BLK = "__ie_blk"
_PAIR = "__ie_pair"

_OPS = {
    "<": np.less,
    "<=": np.less_equal,
    ">": np.greater,
    ">=": np.greater_equal,
}


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
    lbin = F.floor(epoch_us(left_ts) / F.lit(gap_us))
    rbin = F.floor(epoch_us(right_ts) / F.lit(gap_us))
    # replicate left into its own bin and the next: a right row one bin
    # ahead can still be within gap of a late-in-bin left row
    lrep = left.withColumn(BIN_COL, F.explode(F.array(lbin, lbin + 1)))
    rrep = right.withColumn(BIN_COL, rbin)
    cond = (
        (lrep[BIN_COL] == rrep[BIN_COL])
        & (right_ts > left_ts)
        & (epoch_us(right_ts) <= epoch_us(left_ts) + F.lit(gap_us))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lrep.join(rrep, cond).drop(BIN_COL)


def _bucket(col: Column, bounds: list) -> Column:
    """Block index of ``col`` against sorted ``bounds``: the number of
    boundaries <= value, computed JVM-side with an array higher-order
    function (no UDF). Block k thus holds values in [bounds[k-1], bounds[k])."""
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= col))


def ie_join(
    left: DataFrame,
    right: DataFrame,
    cond1: tuple[str, str, str],
    cond2: tuple[str, str, str] | None = None,
    blocks: int = 16,
) -> DataFrame:
    """Inequality join (IEJoin-style, after Khayyat et al. VLDB'15 — the
    algorithm behind DuckDB's inequality-join operator): inner-join rows
    where ``left[a] op1 right[b]`` (and optionally ``left[c] op2
    right[d]``) WITHOUT the BroadcastNestedLoopJoin / CartesianProduct
    plan OSS Spark produces for theta joins.

    Strategy (the distributed half of the published algorithm): partition
    both sides into ``blocks`` ranges of the first join attribute using
    quantile boundaries sampled from the left side. With shared
    boundaries, a (left-block i, right-block j) pair can satisfy
    ``a < b`` only when i <= j (``a > b`` only when i >= j), and the
    optional second condition prunes further via per-block min/max
    bounds. Only surviving block pairs are materialized — each as one
    cogrouped Arrow task running a vectorized numpy kernel — so total
    work is (surviving pairs) x (block-pair kernel), not M x N rows
    through a row-at-a-time nested loop, and no side is broadcast whole.

    Scale contract: ``blocks`` bounds per-task memory (a task sees two
    blocks); quantile boundaries keep left blocks balanced. Output
    cardinality is the join's own: use selective two-sided conditions
    (bands) or aggregate downstream. Column names of ``left`` and
    ``right`` must be disjoint; rows with NULL join attributes are
    dropped (inner-join comparison semantics).

    ``cond1``/``cond2`` are ``(left_col, op, right_col)`` with op in
    ``< <= > >=``.
    """
    a, op1, b = cond1
    if op1 not in _OPS:
        raise ValueError(f"unsupported op {op1!r}")
    if cond2 is not None and cond2[1] not in _OPS:
        raise ValueError(f"unsupported op {cond2[1]!r}")

    left = left.where(F.col(a).isNotNull())
    right = right.where(F.col(b).isNotNull())
    if cond2 is not None:
        left = left.where(F.col(cond2[0]).isNotNull())
        right = right.where(F.col(cond2[2]).isNotNull())

    probs = [i / blocks for i in range(1, blocks)]
    bounds = sorted(set(left.approxQuantile(a, probs, 0.01)))
    lb = left.withColumn(_BLK, _bucket(F.col(a), bounds))
    rb = right.withColumn(_BLK, _bucket(F.col(b), bounds))
    n_blk = len(bounds) + 1

    ascending = op1 in ("<", "<=")
    cand: Iterable[tuple[int, int]] = (
        (i, j)
        for i in range(n_blk)
        for j in range(n_blk)
        if (i <= j if ascending else i >= j)
    )
    if cond2 is not None:
        c, op2, d = cond2
        lstat = {
            r[_BLK]: (r["lo"], r["hi"])
            for r in lb.groupBy(_BLK).agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()
        }
        rstat = {
            r[_BLK]: (r["lo"], r["hi"])
            for r in rb.groupBy(_BLK).agg(F.min(d).alias("lo"), F.max(d).alias("hi")).collect()
        }

        def feasible(i: int, j: int) -> bool:
            if i not in lstat or j not in rstat:
                return False
            (lmin, lmax), (rmin, rmax) = lstat[i], rstat[j]
            if op2 == "<":
                return lmin < rmax
            if op2 == "<=":
                return lmin <= rmax
            if op2 == ">":
                return lmax > rmin
            return lmax >= rmin

        cand = ((i, j) for i, j in cand if feasible(i, j))

    spark = left.sparkSession
    # pair id = i * n_blk + j, generated by explode(sequence(...)) on each
    # side — pure JVM expressions, no auxiliary join. A left row in block i
    # fans out to its feasible right blocks j; a right row in block j to its
    # feasible left blocks i. Infeasible (cond2-pruned) pairs are dropped by
    # a literal IN filter (<= blocks^2/2 ids).
    keep = {i * n_blk + j for i, j in cand}
    if not keep:
        schema = StructType(list(left.schema) + list(right.schema))
        return spark.createDataFrame([], schema)
    blk = F.col(_BLK)
    if ascending:
        lseq = F.sequence(blk * n_blk + blk, blk * n_blk + F.lit(n_blk - 1))
        rseq = F.sequence(blk, blk * n_blk + blk, F.lit(n_blk))
    else:
        lseq = F.sequence(blk * n_blk, blk * n_blk + blk)
        rseq = F.sequence(blk * n_blk + blk, F.lit(n_blk * (n_blk - 1)) + blk, F.lit(n_blk))
    lx = lb.withColumn(_PAIR, F.explode(lseq)).drop(_BLK)
    rx = rb.withColumn(_PAIR, F.explode(rseq)).drop(_BLK)
    if len(keep) < n_blk * n_blk:
        ids = sorted(keep)
        lx = lx.where(F.col(_PAIR).isin(ids))
        rx = rx.where(F.col(_PAIR).isin(ids))

    out_schema = StructType(
        [f for f in lx.schema if f.name != _PAIR] + [f for f in rx.schema if f.name != _PAIR]
    )
    lcols = [f.name for f in lx.schema if f.name != _PAIR]
    rcols = [f.name for f in rx.schema if f.name != _PAIR]
    second = cond2

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({n: pd.Series(dtype=object) for n in lcols + rcols})
        if not len(lpdf) or not len(rpdf):
            return empty
        av = lpdf[a].to_numpy()
        bv = rpdf[b].to_numpy()
        cv = lpdf[second[0]].to_numpy() if second else None
        dv = rpdf[second[2]].to_numpy() if second else None
        li_parts, ri_parts = [], []
        chunk = max(1, 4_000_000 // max(1, len(bv)))
        for s in range(0, len(av), chunk):
            m = _OPS[op1](av[s : s + chunk, None], bv[None, :])
            if second:
                m &= _OPS[second[1]](cv[s : s + chunk, None], dv[None, :])
            li, ri = np.nonzero(m)
            li_parts.append(li + s)
            ri_parts.append(ri)
        li = np.concatenate(li_parts)
        if not len(li):
            return empty
        ri = np.concatenate(ri_parts)
        out = lpdf[lcols].iloc[li].reset_index(drop=True)
        for n in rcols:
            out[n] = rpdf[n].to_numpy()[ri]
        return out

    return (
        lx.groupBy(_PAIR)
        .cogroup(rx.groupBy(_PAIR))
        .applyInPandas(kernel, out_schema)
    )
