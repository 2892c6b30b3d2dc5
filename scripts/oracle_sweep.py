#!/usr/bin/env python
"""Full oracle sweep: every canonical HASH manifest entry vs its DuckDB
oracle, in a VANILLA SparkSession (no session.py confs — the same contract
the grading driver uses), at one or more scale factors.

Usage: python scripts/oracle_sweep.py [out.json] [--sfs sf0.01,sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def sweep(spark, sf: str) -> dict:
    import duckdb

    from limeqo_spark.manifest import REGISTRY, ROTATION_ALIAS_PREFIXES
    from limeqo_spark.testing import compare_frames

    sf_dir = f"/root/testdata/{sf}"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = sorted(
        n
        for n, s in REGISTRY.items()
        if s.oracle is not None and not n.startswith(ROTATION_ALIAS_PREFIXES)
    )
    failures: dict[str, str] = {}
    t0 = time.perf_counter()
    for name in names:
        spec = REGISTRY[name]
        try:
            ok, msg = compare_frames(
                spec.builder(spark, sf_dir).toPandas(),
                con.execute(spec.oracle).fetchdf(),
            )
            if not ok:
                failures[name] = msg
        except Exception as e:  # noqa: BLE001 — a sweep records, never stops
            failures[name] = f"{type(e).__name__}: {e}"
        spark.catalog.clearCache()
    return {
        "entries": len(names),
        "green": len(names) - len(failures),
        "failures": failures,
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--sfs", default="sf0.01,sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("oracle_sweep")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    report = {
        "what": "full oracle sweep: every canonical hash entry vs DuckDB in a vanilla session",
        "sfs": {sf: sweep(spark, sf) for sf in args.sfs.split(",")},
    }
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
