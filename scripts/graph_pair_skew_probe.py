"""Co-pair stage partition-out probe (VERDICT r8 next-round #3).

q106/q107's shared `_co_supply_edges` build is the repo's heaviest genuine
computation (~1e9 codegen pair rows at the x16 graph-offsets replica). The
r8 linear-fit defense showed growth is input-linear; this probe closes the
remaining question — does the pair stream actually PARTITION OUT, or is
there a single-reducer hot spot that a >32-way topology would expose?

Method: build the x16 replica, run the full edge build at
``spark.sql.shuffle.partitions`` in {32, 128, 512}, and for each setting
pull per-stage task-duration quantiles from the Spark REST status API for
the heaviest stages (by executor run time). A hot reducer shows up as a
max/median task-duration ratio that GROWS as partitions shrink the median
(one task pinned at the hot key's full cost); a partitioned-out stage
keeps near-flat max-task wall and a bounded skew ratio at every width.

Writes docs/scale_probe_graph_r9.json. Run:
  python scripts/graph_pair_skew_probe.py [replication, default 16]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe import build_replica  # noqa: E402  (scripts/ sibling)

PARTITION_SWEEP = (32, 128, 512)


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _stage_metrics(spark, min_stage_id: int, top: int = 4) -> list[dict]:
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s["stageId"] >= min_stage_id
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    out = []
    for s in stages[:top]:
        q = _rest(
            spark,
            f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,0.75,0.95,1.0",
        )
        dur = q["duration"]
        med, mx = dur[1], dur[4]
        out.append(
            {
                "stage_id": s["stageId"],
                "num_tasks": s["numCompleteTasks"],
                "executor_run_time_s": round(s["executorRunTime"] / 1e3, 2),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "task_duration_s": {
                    "min": round(dur[0] / 1e3, 3),
                    "p50": round(med / 1e3, 3),
                    "p75": round(dur[2] / 1e3, 3),
                    "p95": round(dur[3] / 1e3, 3),
                    "max": round(mx / 1e3, 3),
                },
                "skew_max_over_p50": round(mx / med, 2) if med else None,
            }
        )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from limeqo_spark.relational.queries_profile import _co_supply_edges
    from limeqo_spark.session import get_spark

    spark = get_spark(
        "graph_pair_skew_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up
    replica = f"/tmp/limeqo_scale/x{n}"
    if not os.path.isdir(f"{replica}/lineitem.parquet"):
        build_replica(spark, replica, n, graph_offsets=True)

    runs = []
    for p in PARTITION_SWEEP:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        min_stage = max(
            (s["stageId"] for s in _rest(spark, "/stages")), default=-1
        ) + 1
        t0 = time.monotonic()
        edges = _co_supply_edges(spark, replica)
        n_edges = edges.count()
        wall = time.monotonic() - t0
        runs.append(
            {
                "shuffle_partitions": p,
                "wall_s": round(wall, 2),
                "n_edges": n_edges,
                "heaviest_stages": _stage_metrics(spark, min_stage),
            }
        )
        print(json.dumps(runs[-1]))

    # verdict: max-task wall of the heaviest stage should not grow as the
    # reducer width grows (a hot key would pin it), and skew stays bounded
    heaviest_max = [r["heaviest_stages"][0]["task_duration_s"]["max"] for r in runs]
    report = {
        "probe": "co_pair_partition_out",
        "replication": n,
        "aqe_enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "runs": runs,
        "heaviest_stage_max_task_s_by_width": dict(
            zip([str(p) for p in PARTITION_SWEEP], heaviest_max)
        ),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "scale_probe_graph_r9.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
