#!/usr/bin/env python
"""CEB LimeQO+ mid-checkpoint lab (VERDICT r8 next-round #5b): does the
selection-level agreement-gated ALS+TCNN ensemble close the @0.75-3h gap?

Context: the embeddings-only NumpyTCNN trails the plan-featurized baseline
at CEB mid-checkpoints (ratio-of-means 1.06-1.11; systematic per
docs/ceb_at3h_attribution_r7.json). Prediction-level averaging was a
measured NEGATIVE in r3-r6 (destroys the explorer's edge), so this tries
the other combination axis: TCNN keeps its ordering, ALS vetoes picks it
doesn't also rank highly, fill comes from the ALS ranking.

Protocol mirrors baseline_parity.py: 5 free-init reps (seed=rep) at a 3 h
exploration budget; curves interpolated at 0.75/1.5/3.0 h with the
baseline's own x-axis convention (exec_time minus the up-front default
workload total). Compares model='tcnn' (shipped config) vs
model='ensemble' vs published baseline means.

Usage: python scripts/ensemble_lab_r9.py [out.json] [--reps N] [--budget-h H]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from limeqo_spark.strategies import LimeQOPlusStrategy  # noqa: E402
from limeqo_spark.workload import Workload  # noqa: E402

REF = "/root/reference/dataset"
CHECKPOINTS_H = [0.75, 1.5, 3.0]
BASELINE_MEAN = {0.75: 1.293, 1.5: 1.193, 3.0: 1.145}


def curve_at(records: list[dict], cps_h: list[float]) -> list[float]:
    pg_total = records[0]["exec_time"]
    x = np.array([(r["exec_time"] - pg_total) / 3600 for r in records])
    y = np.array([r["total_latency"] / 3600 for r in records])
    return [round(float(np.interp(c, x, y)), 4) for c in cps_h]


def main() -> None:
    argv = sys.argv[1:]
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 5
    budget_h = (
        float(argv[argv.index("--budget-h") + 1]) if "--budget-h" in argv else 3.0
    )
    out_path = argv[0] if argv and not argv[0].startswith("--") else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "ensemble_lab_r9.json",
    )
    wl = Workload.from_reference(
        f"{REF}/ceb-matrix.csv", f"{REF}/init_ceb_mask.npy"
    )
    report: dict = {
        "budget_h": budget_h,
        "reps": reps,
        "checkpoints_h": CHECKPOINTS_H,
        "baseline_mean_h": BASELINE_MEAN,
        "models": {},
    }
    for model in ("tcnn", "ensemble"):
        per_rep, walls = [], []
        for rep in range(reps):
            t0 = time.perf_counter()
            rec = LimeQOPlusStrategy(
                wl, seed=rep, time_budget=budget_h * 3600,
                max_rounds=1_000_000, slack=None, model=model,
            ).run()
            walls.append(round(time.perf_counter() - t0, 1))
            per_rep.append(curve_at(rec, CHECKPOINTS_H))
            print(f"{model} rep {rep}: {per_rep[-1]} ({walls[-1]}s)", flush=True)
        arr = np.array(per_rep)
        report["models"][model] = {
            "per_rep_h": {str(r): per_rep[r] for r in range(reps)},
            "mean_h": [round(float(v), 4) for v in arr.mean(0)],
            "ratio_of_means": [
                round(float(arr.mean(0)[i]) / BASELINE_MEAN[c], 4)
                for i, c in enumerate(CHECKPOINTS_H)
            ],
            "wall_s": walls,
        }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({m: v["ratio_of_means"] for m, v in report["models"].items()}))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
