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
