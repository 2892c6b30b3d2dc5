"""Bucketing eliminates the join shuffle: the 100 TB co-location path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from limeqo_spark.bucketing import colocated_join, exchanges_in_executed_plan, write_bucketed
from limeqo_spark.io import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # pid-suffixed names: two concurrent suite runs share one
    # spark-warehouse/, and fixed names race on the table location
    # (observed running the full suite twice concurrently as a load repro)
    import os

    li_name, ord_name = f"li_bkt_{os.getpid()}", f"ord_bkt_{os.getpid()}"
    write_bucketed(
        table(spark, SF, "lineitem").select("l_orderkey", "l_quantity"),
        li_name,
        ["l_orderkey"],
        n_buckets=8,
    )
    write_bucketed(
        table(spark, SF, "orders").select("o_orderkey", "o_orderstatus"),
        ord_name,
        ["o_orderkey"],
        n_buckets=8,
    )
    yield li_name, ord_name
    spark.sql(f"DROP TABLE IF EXISTS {li_name}")
    spark.sql(f"DROP TABLE IF EXISTS {ord_name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, od = bucketed_tables
    joined = colocated_join(
        spark, li, od, spark.table(li).l_orderkey == spark.table(od).o_orderkey
    )
    # compare with the plain (unbucketed) join, which must shuffle both sides
    # hint must go on an input side (post-join .hint() is a no-op — AQE
    # would broadcast this tiny fixture and hide the shuffle)
    plain = (
        table(spark, SF, "lineitem")
        .hint("MERGE")
        .join(table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    n_bucketed = exchanges_in_executed_plan(joined)
    n_plain = exchanges_in_executed_plan(plain)
    assert n_bucketed == 0, f"bucketed join still shuffles ({n_bucketed} exchanges)"
    assert n_plain >= 1


def test_bucketed_results_match_plain(spark, bucketed_tables):
    li, od = bucketed_tables
    a = (
        colocated_join(spark, li, od, spark.table(li).l_orderkey == spark.table(od).o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    b = (
        table(spark, SF, "lineitem")
        .join(table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_equals_plain_join(spark):
    """Salting is result-invariant: same rows as the unsalted join, and the
    salted fact side spreads each hot key over multiple salt buckets."""
    from pyspark.sql import functions as F

    from limeqo_spark.io import table
    from limeqo_spark.skew import SALT_COL, salt_large, salted_join

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events").select("event_type", "value")
    dim = (
        ev.select("event_type").distinct()
        .select(F.col("event_type").alias("d_type"), F.upper("event_type").alias("label"))
    )
    plain = ev.join(dim, ev.event_type == dim.d_type).groupBy("label").count()
    salted = (
        salted_join(ev, dim, ev.event_type == dim.d_type, factor=8)
        .groupBy("label").count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    spread = (
        salt_large(ev, 8).groupBy("event_type")
        .agg(F.countDistinct(SALT_COL).alias("buckets")).collect()
    )
    assert all(r["buckets"] >= 6 for r in spread), spread


def test_ensure_bucketed_pair_join_is_bucket_local(spark):
    """q51's ingest layout: a forced SortMergeJoin over the bucketed pair
    needs no exchange on either input (only the final agg shuffles its
    few-row partials), while the same SMJ over raw parquet shuffles both
    fact sides."""
    from limeqo_spark.bucketing import ensure_bucketed_pair

    sf = "/root/testdata/sf0.001"
    li_name, o_name = ensure_bucketed_pair(spark, sf)
    bucketed = (
        spark.table(li_name).hint("MERGE")
        .join(spark.table(o_name), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        table(spark, sf, "lineitem").hint("MERGE")
        .join(table(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    n_bucketed = exchanges_in_executed_plan(bucketed)
    n_plain = exchanges_in_executed_plan(plain)
    assert n_bucketed == 1, f"expected only the agg exchange, got {n_bucketed}"
    assert n_plain >= 3, f"plain SMJ should shuffle both sides + agg, got {n_plain}"


def test_binned_range_join_matches_brute_force(spark):
    """Property: binned_range_join == the O(M*N) definition on random
    timestamps, including bin-boundary pairs (the replicate-to-next-bin
    edge case)."""
    import itertools

    import numpy as np

    from pyspark.sql import functions as F

    from limeqo_spark.rangejoin import binned_range_join

    rng = np.random.default_rng(11)
    gap_s = 60.0
    # cluster timestamps near bin boundaries to stress the +1-bin replica
    base = 1_700_000_000_000_000  # us
    ts = base + (rng.integers(0, 40, 300) * 60_000_000
                 + rng.integers(-2_000_000, 2_000_000, 300))
    rows = [(int(i), int(t)) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "id bigint, us bigint").withColumn(
        "ts", F.timestamp_micros(F.col("us"))
    )
    a = df.select(F.col("id").alias("ia"), F.col("ts").alias("ta"))
    b = df.select(F.col("id").alias("ib"), F.col("ts").alias("tb"))
    got = {
        (r.ia, r.ib)
        for r in binned_range_join(a, b, F.col("ta"), F.col("tb"), gap_s).collect()
    }
    gap_us = int(gap_s * 1_000_000)
    want = {
        (i, j)
        for (i, ti), (j, tj) in itertools.product(enumerate(ts), repeat=2)
        if tj > ti and tj <= ti + gap_us
    }
    assert got == want, f"missing={len(want-got)} extra={len(got-want)}"


def test_ie_join_matches_brute_force(spark):
    """Property: ie_join == crossJoin+filter for every op direction, on
    random doubles with NULLs (dropped, matching SQL comparison
    semantics), one- and two-condition forms."""
    import numpy as np

    from pyspark.sql import functions as F

    from limeqo_spark.rangejoin import ie_join

    rng = np.random.default_rng(23)

    def side(n, pa, pb):
        rows = []
        for i in range(n):
            x = None if rng.random() < 0.05 else float(rng.uniform(0, 100))
            y = None if rng.random() < 0.05 else float(rng.uniform(0, 100))
            rows.append((i, x, y))
        return rows

    a = spark.createDataFrame(side(250, "xa", "ya"), "ida long, xa double, ya double")
    b = spark.createDataFrame(side(200, "xb", "yb"), "idb long, xb double, yb double")
    cases = [
        (("xa", "<", "xb"), ("ya", ">", "yb")),
        (("xa", ">", "xb"), ("ya", "<=", "yb")),
        (("xa", ">=", "xb"), None),
    ]
    for c1, c2 in cases:
        got = {
            (r.ida, r.idb)
            for r in ie_join(a, b, c1, c2, blocks=6).select("ida", "idb").collect()
        }
        cond = F.expr(f"{c1[0]} {c1[1]} {c1[2]}")
        if c2 is not None:
            cond = cond & F.expr(f"{c2[0]} {c2[1]} {c2[2]}")
        want = {
            (r.ida, r.idb)
            for r in a.crossJoin(b).where(cond).select("ida", "idb").collect()
        }
        assert got == want, f"{c1} {c2}: missing={len(want-got)} extra={len(got-want)}"
