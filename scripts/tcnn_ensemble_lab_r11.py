#!/usr/bin/env python
"""TCNN restart-averaging lab (VERDICT r10 #6): CEB LimeQO+ @0.75 h across
the five fixed unselected inits (net_seed 0..4) for each ensemble config.
Baseline (n_nets=1): per-init {0: 1.4555, 1: 1.3427, 2: 1.3745, 3: 1.3463,
4: 1.4055}, median 1.3745 h; published reference checkpoint 1.293 h.

Writes docs/tcnn_ensemble_lab_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from limeqo_spark.strategies import LimeQOPlusStrategy
from limeqo_spark.workload import Workload

REF = "/root/reference/dataset"
BUDGET = 0.75 * 3600

CONFIGS = [
    {"tag": "single_repro", "n_nets": 1, "net_combine": "mean"},
    {"tag": "ens3_mean", "n_nets": 3, "net_combine": "mean"},
    {"tag": "ens3_median", "n_nets": 3, "net_combine": "median"},
    {"tag": "ens5_mean", "n_nets": 5, "net_combine": "mean"},
]


def main() -> None:
    wl = Workload.from_reference(
        f"{REF}/ceb-matrix.csv", f"{REF}/init_ceb_mask.npy"
    )
    out: dict = {"budget_h": 0.75, "configs": {}}
    for cfg in CONFIGS:
        per_init = {}
        walls = {}
        for net_seed in range(5):
            t0 = time.perf_counter()
            rec = LimeQOPlusStrategy(
                wl, seed=1, max_rounds=100_000, time_budget=BUDGET,
                model="tcnn", net_seed=net_seed,
                n_nets=cfg["n_nets"], net_combine=cfg["net_combine"],
            ).run()
            per_init[net_seed] = round(float(rec[-1]["total_latency"]) / 3600, 4)
            walls[net_seed] = round(time.perf_counter() - t0, 1)
            print(cfg["tag"], net_seed, per_init[net_seed], flush=True)
        vals = sorted(per_init.values())
        out["configs"][cfg["tag"]] = {
            **cfg,
            "per_init_h": per_init,
            "median_h": vals[len(vals) // 2],
            "mean_h": round(float(np.mean(vals)), 4),
            "worst_h": vals[-1],
            "wall_s": walls,
        }
        with open("docs/tcnn_ensemble_lab_r11.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({t: c["median_h"] for t, c in out["configs"].items()}))


if __name__ == "__main__":
    main()
