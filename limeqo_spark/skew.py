"""Skew mitigation for hot-key joins: explicit key salting.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime by splitting oversized partitions,
but it only works for sort-merge joins and only after a shuffle has already
materialized the skew. Salting removes the hot-key bottleneck *before* the
shuffle: the big side scatters each key across ``factor`` sub-keys, the
small side replicates each key ``factor`` times, and the join runs on
(key, salt) — turning one 100 GB hot-key partition into ``factor`` even
slices. Built-in expressions only (rand/explode/sequence); the result is
provably identical to the unsalted join, which is exactly what the
registry's oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__limeqo_salt"


def salt_large(df: DataFrame, factor: int, seed: int = 7) -> DataFrame:
    """Scatter the big (skewed) side: each row gets a uniform salt in
    [0, factor). Row count unchanged."""
    return df.withColumn(SALT_COL, (F.rand(seed) * factor).cast("int"))


def replicate_small(df: DataFrame, factor: int) -> DataFrame:
    """Replicate the small side once per salt value so every (key, salt)
    bucket of the big side finds its match. Row count x factor."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    factor: int = 8,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Inner/left join ``large`` with ``small`` on ``on`` with salted keys.

    ``on`` is the ordinary equi-join condition (e.g. ``l.l_orderkey ==
    o.o_orderkey``); the salt equality is added on top. The salt column is
    dropped from the result, so this is a drop-in replacement for
    ``large.join(small, on, how)`` wherever the key histogram is skewed.

    Only joins that preserve at most the LARGE side are supported: a
    right/full join would emit each unmatched small-side row once per salt
    replica (``factor`` null-padded copies instead of one).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "under right/full joins"
        )
    lg = salt_large(large, factor, seed)
    sm = replicate_small(small, factor)
    cond = on & (lg[SALT_COL] == sm[SALT_COL])
    return lg.join(sm, cond, how).drop(lg[SALT_COL]).drop(sm[SALT_COL])
