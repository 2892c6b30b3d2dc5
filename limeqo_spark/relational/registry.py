"""Query registry: name -> (Spark builder, DuckDB oracle SQL, check kind).

Determinism rules (FIXTURES.md §3): money aggregates go through
DECIMAL(18,2/4/6) so the sum is exact and engine-independent, floats are
ROUND(x, 4) (2 for money totals), timestamps leave the query as DATE or
epoch BIGINT, and ranking windows order by a unique key suffix.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None => property-checked (rows-only gate)
    check: str  # "hash" | "prop"
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, check: str = "hash", doc: str = "") -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        REGISTRY[name] = QuerySpec(name, fn, oracle, check, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


class GateFailure(AssertionError):
    """A driver-visible property-gate failure: raised by gate builders so the
    grading driver's rows-only PROP check records a non-null ``err`` instead
    of an unchanged row count (VERDICT r6 next-round #2 — a constant-size
    frame with an ``ok=false`` cell is invisible to a rows-only check)."""


def raise_on_failed_gates(df: DataFrame, gate_name: str, ok_col: str = "ok") -> DataFrame:
    """Evaluate a small gate frame eagerly; raise :class:`GateFailure` naming
    the failing rows if any ``ok_col`` cell is false/NULL, else return the
    already-computed rows as a local DataFrame (same schema) so the caller's
    subsequent count/collect does not recompute an expensive plan (the ANN
    recall gate's input is the entire approximate-ANN family)."""
    rows = df.collect()
    if not rows:
        raise GateFailure(f"{gate_name}: gate frame is empty — nothing was checked")
    failing = [r for r in rows if not bool(r[ok_col])]
    if failing:
        detail = "; ".join(str(r.asDict()) for r in failing[:10])
        raise GateFailure(
            f"{gate_name}: {len(failing)}/{len(rows)} gate row(s) failed: {detail}"
        )
    return df.sparkSession.createDataFrame(rows, df.schema)
