"""t2 gate rehearsal: every hash-checked manifest query vs its DuckDB oracle
on sf0.01 — the same comparison the driver performs (SURVEY §5.2.1)."""

from __future__ import annotations

import pytest

from limeqo_spark.manifest import REGISTRY
from limeqo_spark.testing import compare_frames

HASH_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
PROP_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", HASH_QUERIES)
def test_hash_parity(spark, ddb, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    oracle_pdf = ddb.execute(spec.oracle).fetchdf()
    ok, msg = compare_frames(spark_pdf, oracle_pdf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", PROP_QUERIES)
def test_prop_queries_run(spark, sf_dir, name):
    """Property-checked queries must at least run and return rows; their
    specific assertions live in dedicated test modules."""
    df = REGISTRY[name].builder(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
    # generic convention: any boolean column named ok/consistent/two_phase
    # on a prop query is an inline assertion — all must be true
    for row in rows:
        d = row.asDict()
        for k in ("ok", "consistent", "two_phase", "has_agg", "has_exchange"):
            if k in d and d[k] is not None:
                assert d[k] is True, f"{name}: {k} is {d[k]}"
