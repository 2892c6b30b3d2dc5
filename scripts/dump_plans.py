#!/usr/bin/env python
"""Dump formatted physical plans for the bench headline queries into
docs/plans/ — the review artifact for the plan-quality claims (pushdown,
broadcast choices, partial aggregates, exchange counts). Regenerate after
operator changes:

    python scripts/dump_plans.py [sf_dir] [query_names...]

With explicit query names, dumps those instead of the headline set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    explicit = sys.argv[2:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "plans")
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE
    from limeqo_spark.manifest import REGISTRY
    from limeqo_spark.plans import explain_formatted
    from limeqo_spark.session import get_spark

    spark = get_spark("dump_plans", shuffle_partitions=8)
    unknown = [n for n in explicit if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown manifest entries: {unknown}")
    for name in (explicit or HEADLINE):
        spec = REGISTRY.get(name)
        if spec is None or name.startswith("q44"):  # streaming plans need a run
            continue
        try:
            text = explain_formatted(spec.builder(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic tool
            text = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(f"-- {name} @ {sf_dir}\n\n{text}\n")
        print(name, "->", f"docs/plans/{name}.txt")


if __name__ == "__main__":
    main()
