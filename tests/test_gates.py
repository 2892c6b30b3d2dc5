"""Driver-visibility of property-gate failures (VERDICT r6 next-round #2).

The grading driver's no-oracle check records only ``spark_rows`` / ``err``,
so a gate frame whose ``ok`` column flips to false WITHOUT changing the row
count or raising is invisible to it. ``raise_on_failed_gates`` closes that:
every gate builder (prop_gates, ann_recall_gate, scale_pruning_gate,
text_quality_classifier) now raises :class:`GateFailure` on any failing row,
which the driver records as a non-null ``err``.
"""

from __future__ import annotations

import pytest

import limeqo_spark.manifest  # noqa: F401 — populate the registry
from limeqo_spark.relational.registry import (
    REGISTRY,
    GateFailure,
    QuerySpec,
    raise_on_failed_gates,
)


def test_raise_on_failed_gates_passes_through_green_frame(spark):
    df = spark.createDataFrame(
        [("a", 1, True), ("b", 2, True)], "gate string, n bigint, ok boolean"
    )
    out = raise_on_failed_gates(df, "t")
    assert [r["gate"] for r in out.orderBy("gate").collect()] == ["a", "b"]
    assert out.schema == df.schema


def test_raise_on_failed_gates_raises_naming_failures(spark):
    df = spark.createDataFrame(
        [("a", 1, True), ("bad_gate", 0, False)], "gate string, n bigint, ok boolean"
    )
    with pytest.raises(GateFailure, match="1/2") as ei:
        raise_on_failed_gates(df, "t")
    assert "bad_gate" in str(ei.value)


def test_raise_on_failed_gates_raises_on_null_ok(spark):
    df = spark.createDataFrame([("a", None)], "gate string, ok boolean")
    with pytest.raises(GateFailure):
        raise_on_failed_gates(df, "t")


def test_raise_on_failed_gates_raises_on_empty_frame(spark):
    df = spark.createDataFrame([], "gate string, ok boolean")
    with pytest.raises(GateFailure, match="empty"):
        raise_on_failed_gates(df, "t")


def test_prop_gates_broken_subentry_is_driver_visible(spark, sf_dir):
    """Rehearsal: deliberately break one rolled-up PROP entry and run
    prop_gates exactly the way the driver does (build, then count rows) —
    the failure must surface as a raise (driver ``err``), not as an
    unchanged 8-row frame. Then revert and confirm green."""
    from limeqo_spark.relational import queries_gates as qg

    name = qg._PROP_GATE_ENTRIES[0]
    real = REGISTRY[name]

    def broken(s, d):
        return s.createDataFrame([(0, False)], "n bigint, ok boolean")

    REGISTRY[name] = QuerySpec(name, broken, None, "prop", "broken rehearsal")
    try:
        with pytest.raises(GateFailure, match=name):
            qg.prop_gates(spark, sf_dir).count()
    finally:
        REGISTRY[name] = real


def test_prop_gates_schema_drift_reads_as_failed_row_not_crash(spark, sf_dir):
    """A rolled-up entry that lost every boolean column (schema drift) must
    read as a FAILED gate row inside the GateFailure message — not take the
    roll-up down with a TypeError from reduce() over zero columns."""
    from limeqo_spark.relational import queries_gates as qg

    name = qg._PROP_GATE_ENTRIES[0]
    real = REGISTRY[name]

    def no_bools(s, d):
        return s.createDataFrame([(1,)], "n bigint")

    REGISTRY[name] = QuerySpec(name, no_bools, None, "prop", "drift rehearsal")
    try:
        with pytest.raises(GateFailure, match=name):
            qg.prop_gates(spark, sf_dir).count()
    finally:
        REGISTRY[name] = real


def test_quality_classifier_cached_failure_still_raises(spark, sf_dir):
    """The memoized path must go through the same gate: a cached auc_ok=False
    row raises instead of silently returning the 1-row frame."""
    from limeqo_spark.pipeline import text as tx

    key = "/tmp/__gate_rehearsal__"
    tx._CLASSIFIER_CACHE[key] = (10, 5, 0.5, "digit_ratio", False)
    try:
        with pytest.raises(GateFailure, match="text_quality_classifier"):
            REGISTRY["text_quality_classifier"].builder(spark, key)
    finally:
        del tx._CLASSIFIER_CACHE[key]


def test_q36_seeded_sample_raises_on_planted_inconsistency(spark, sf_dir, monkeypatch):
    """VERDICT r9 #3: q36's self-consistency bound must raise inside the
    builder (driver err), not only flip an ok column. Plant: mismatched
    seeds make the two samples differ."""
    from limeqo_spark.relational import queries_agg_window as qa

    monkeypatch.setattr(qa, "_Q36_SEEDS", (42, 7))
    with pytest.raises(GateFailure, match="q36_seeded_sample"):
        REGISTRY["q36_seeded_sample"].builder(spark, sf_dir)


def test_q63_stratified_sample_raises_on_planted_inconsistency(
    spark, sf_dir, monkeypatch
):
    """Same upgrade for the stratified sampler: mismatched rerun seeds fail
    the reproducibility half of every stratum's ok, and the builder raises."""
    from limeqo_spark.relational import queries_functions as qf

    monkeypatch.setattr(qf, "_Q63_SEEDS", (41, 7))
    with pytest.raises(GateFailure, match="q63_stratified_sample"):
        REGISTRY["q63_stratified_sample"].builder(spark, sf_dir)


def test_q64_sized_file_sink_raises_on_planted_cap_violation(
    spark, sf_dir, monkeypatch
):
    """Same upgrade for the sized sink: checking the written files against a
    cap far below what the writer was asked for plants a violated bound —
    the builder must raise, not return ok=false."""
    from limeqo_spark.relational import queries_functions as qf

    monkeypatch.setattr(qf, "_Q64_CHECK_CAP", 10)
    with pytest.raises(GateFailure, match="q64_sized_file_sink"):
        REGISTRY["q64_sized_file_sink"].builder(spark, sf_dir)


def test_q18_approx_distinct_raises_on_planted_tolerance(spark, sf_dir, monkeypatch):
    """Extended r10: the HLL 5% bound raises inside the builder. Plant: a
    negative tolerance no estimate can meet."""
    from limeqo_spark.relational import queries_agg_window as qa

    monkeypatch.setattr(qa, "_Q18_TOL", -1.0)
    with pytest.raises(GateFailure, match="q18_approx_count_distinct"):
        REGISTRY["q18_approx_count_distinct"].builder(spark, sf_dir)


def test_q20_partial_agg_plan_raises_on_planted_bar(spark, sf_dir, monkeypatch):
    """Plant: demand 99 HashAggregate nodes — the two-phase check fails and
    the builder raises."""
    from limeqo_spark.relational import queries_agg_window as qa

    monkeypatch.setattr(qa, "_Q20_MIN_AGGS", 99)
    with pytest.raises(GateFailure, match="q20_partial_agg_plan"):
        REGISTRY["q20_partial_agg_plan"].builder(spark, sf_dir)


def test_q87_compaction_raises_on_planted_target_offset(spark, sf_dir, monkeypatch):
    """Plant: shift the expected output-file count by one — the compaction
    gate must raise on the mismatch."""
    from limeqo_spark.relational import queries_functions as qf

    monkeypatch.setattr(qf, "_Q87_TARGET_OFFSET", 1)
    with pytest.raises(GateFailure, match="q87_compact_small_files"):
        REGISTRY["q87_compact_small_files"].builder(spark, sf_dir)


def test_sketch_profile_raises_on_planted_tolerance(spark, sf_dir, monkeypatch):
    """Plant: a negative HLL tolerance — every language's hll_ok flips and
    the sketch profile raises."""
    from limeqo_spark.pipeline import sketches as sk

    monkeypatch.setattr(sk, "HLL_TOL", -1.0)
    with pytest.raises(GateFailure, match="corpus_sketch_profile"):
        REGISTRY["corpus_sketch_profile"].builder(spark, sf_dir)
