#!/usr/bin/env python
"""TCNN restart-averaging lab, part 2 (VERDICT r10 #6 follow-up): push
CEB LimeQO+ @0.75 h from ens3_mean's 1.3267 h median toward the published
1.293 h. Part-1 results (docs/tcnn_ensemble_lab_r11.json): single 1.3745,
ens3_mean 1.3267, ens3_median 1.3327, ens5_mean 1.3365 (one diverged
seed). Hypotheses here:

- ens3_k32: the reference's k=32 batches — averaging may stabilize
  predictions enough to justify the bigger batch (fewer, larger reveals).
- ens3_patience5: ensembles stall less often, so the patience-3 reinit
  may fire prematurely and discard a healthy averaged model.
- ens4_mean: between the part-1 winner and the diverged ens5.

Writes docs/tcnn_ensemble_lab2_r11.json.
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
    {"tag": "ens3_k32", "n_nets": 3, "k": 32},
    {"tag": "ens3_patience5", "n_nets": 3, "patience": 5},
    {"tag": "ens4_mean", "n_nets": 4},
]


def main() -> None:
    wl = Workload.from_reference(
        f"{REF}/ceb-matrix.csv", f"{REF}/init_ceb_mask.npy"
    )
    out: dict = {"budget_h": 0.75, "configs": {}}
    for cfg in CONFIGS:
        per_init = {}
        for net_seed in range(5):
            kw = dict(
                seed=1, max_rounds=100_000, time_budget=BUDGET,
                model="tcnn", net_seed=net_seed, n_nets=cfg["n_nets"],
            )
            if "k" in cfg:
                kw["k"] = cfg["k"]
            s = LimeQOPlusStrategy(wl, **kw)
            if "patience" in cfg:
                s.reinit_patience = cfg["patience"]
            t0 = time.perf_counter()
            rec = s.run()
            per_init[net_seed] = round(float(rec[-1]["total_latency"]) / 3600, 4)
            print(cfg["tag"], net_seed, per_init[net_seed],
                  round(time.perf_counter() - t0, 1), "s", flush=True)
        vals = sorted(per_init.values())
        out["configs"][cfg["tag"]] = {
            **cfg,
            "per_init_h": per_init,
            "median_h": vals[len(vals) // 2],
            "mean_h": round(float(np.mean(vals)), 4),
            "worst_h": vals[-1],
        }
        with open("docs/tcnn_ensemble_lab2_r11.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({t: c["median_h"] for t, c in out["configs"].items()}))


if __name__ == "__main__":
    main()
