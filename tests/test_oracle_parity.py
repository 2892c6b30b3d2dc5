"""t2 gate rehearsal: every hash-checked manifest query vs its DuckDB oracle
on sf0.01 — the same comparison the driver performs (SURVEY §5.2.1)."""

from __future__ import annotations

import pytest

from limeqo_spark.manifest import REGISTRY, ROTATION_ALIAS_PREFIXES
from limeqo_spark.testing import compare_frames

# rotation aliases point at the same builder/oracle as their canonical
# entry — running them locally would only double wall time
_CANONICAL = {
    n: s
    for n, s in REGISTRY.items()
    if not n.startswith(ROTATION_ALIAS_PREFIXES)
}
HASH_QUERIES = sorted(n for n, s in _CANONICAL.items() if s.oracle is not None)
PROP_QUERIES = sorted(n for n, s in _CANONICAL.items() if s.oracle is None)


@pytest.mark.parametrize("name", HASH_QUERIES)
def test_hash_parity(spark, ddb, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    oracle_pdf = ddb.execute(spec.oracle).fetchdf()
    ok, msg = compare_frames(spark_pdf, oracle_pdf)
    assert ok, f"{name}: {msg}"


# minimum row counts at sf0.01 — a prop query silently returning an empty
# frame must fail the gate, not slide past it (VERDICT r2 §wrong.2)
PROP_MIN_ROWS = {
    "corpus_sketch_profile": 5,
    "text_quality_classifier": 1,
    "q18_approx_count_distinct": 1,
    "q20_partial_agg_plan": 1,
    "q87_compact_small_files": 1,
    "q36_seeded_sample": 1,
    "q44d_stream_dedup_watermark": 1,
    "q63_stratified_sample": 5,
    "q64_sized_file_sink": 1,
    "ann_recall_gate": 5,
    "bitext_recall_gate": 2,
    "limeqo_mllib_complete_agree": 1,
    "scale_pruning_gate": 2,
    "prop_gates": 8,
    # full corpus + 20 planted clones, one row per vector
    "dedup_semantic_clusters": 520,
}


def test_prop_min_rows_covers_all_prop_queries():
    assert set(PROP_MIN_ROWS) == set(PROP_QUERIES)


@pytest.mark.parametrize("name", PROP_QUERIES)
def test_prop_queries_run(spark, sf_dir, name):
    """Property-checked queries must at least run and return rows; their
    specific assertions live in dedicated test modules."""
    df = REGISTRY[name].builder(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= PROP_MIN_ROWS[name] and df.columns
    # generic convention: any boolean column named ok/*_ok/consistent/
    # two_phase/has_* on a prop query is an inline assertion — all true
    for row in rows:
        d = row.asDict()
        for k, v in d.items():
            if v is None:
                continue
            if (
                k in ("ok", "consistent", "two_phase")
                or k.endswith("_ok")
                or k.startswith("has_")
            ):
                assert v is True, f"{name}: {k} is {v}"


def test_harness_detects_value_mutations(spark, ddb, sf_dir):
    """Meta-guard: the comparison the whole gate rests on must actually
    bite. A single mutated value, a dropped row, and a renamed column
    each have to fail compare_frames against the true oracle."""
    spec = REGISTRY["q16_tpch_q1_agg"]
    good = spec.builder(spark, sf_dir).toPandas()
    oracle = ddb.execute(spec.oracle).fetchdf()
    ok, _ = compare_frames(good.copy(), oracle)
    assert ok

    mutated = good.copy()
    num_cols = [c for c in mutated.columns if mutated[c].dtype.kind in "if"]
    mutated.loc[mutated.index[0], num_cols[0]] += 1
    ok, _ = compare_frames(mutated, oracle)
    assert not ok, "value mutation slipped through the hash gate"

    dropped = good.iloc[1:].copy()
    ok, _ = compare_frames(dropped, oracle)
    assert not ok, "dropped row slipped through"

    renamed = good.rename(columns={good.columns[0]: "zz_renamed"})
    ok, _ = compare_frames(renamed, oracle)
    assert not ok, "schema drift slipped through"
