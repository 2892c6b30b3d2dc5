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


#: keyed retained caches — see :func:`retain`
_RETAINED: dict[str, DataFrame] = {}


def retain(key: str, df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` under a stable ``key``, releasing whatever was retained
    under that key by a PREVIOUS invocation first.

    Builders that persist a multi-consumer intermediate (q98's per-key
    counts, SemDeDup's assignment frame) cannot unpersist before returning
    — the returned lazy plan still reads the cache — so a plain
    ``.persist()`` pins one frame in the CacheManager per *invocation*,
    which accumulates across a 170-entry oracle sweep in one session
    (ADVICE r7). Keyed retention bounds that to one frame per call *site*:
    re-running any builder frees its own previous cache, and harnesses can
    call :func:`release_retained` between entries to drop all of them.
    Frames that need materialize-once without a live cache entry use
    ``localCheckpoint(eager=True)`` instead (auto-cleaned by the
    ContextCleaner once unreferenced)."""
    old = _RETAINED.pop(key, None)
    if old is not None:
        old.unpersist()
    _RETAINED[key] = df.persist(level) if level is not None else df.persist()
    return _RETAINED[key]


def release_retained() -> int:
    """Unpersist every frame registered via :func:`retain`; returns how many
    were released. Safe to call at any time — subsequent actions on plans
    that referenced a released cache recompute correctly."""
    n = len(_RETAINED)
    for df in _RETAINED.values():
        df.unpersist()
    _RETAINED.clear()
    return n


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
