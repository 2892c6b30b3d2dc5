#!/usr/bin/env python
"""TCNN budget-rationality cap, full-curve measurement: the SPENT-SCALED
cap (``tol <= 2% x max(spent, 300 s)``; LANDED in LimeQOPlusStrategy in
round 6) vs round 5's budget-frac cap (``tol <= 2% x time_budget``) on the
CEB matrix at the full 12 h exploration budget, five FIXED weight inits
(net_seed 0-4, exploration seed 1 — the rescue study's protocol,
docs/tcnn_rescue_r5.json), reported at the published checkpoint grid
(0.75/1.5/3/6/12 h).

The r5 @3h parity miss (ratio 1.11, docs/baseline_parity_ceb_r5.json) was
one bad-init rep whose mid-run probes the budget cap (2% x 12 h = 864 s)
is too loose to discipline; the spent-scaled cap is tight early (start
6 s, reaching 864 s only once 12 h is actually spent) and budget-free, so
it also applies to unbounded runs. ``--cap shipped`` now reproduces the
RETIRED r5 budget cap via the BudgetCapStrategy subclass below (the main
class carries the spent cap); historical run artifacts in docs/capcurve_r5
keep their original labels.

Usage:
  python scripts/tcnn_cap_curve.py run --cap {shipped,spent} --net-seed N
  python scripts/tcnn_cap_curve.py summarize
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from limeqo_spark.report import interp_run
from limeqo_spark.strategies import LimeQOPlusStrategy, LimeQOStrategy
from limeqo_spark.workload import Workload

CEB = (
    "/root/reference/dataset/ceb-matrix.csv",
    "/root/reference/dataset/init_ceb_mask.npy",
)
BUDGET_H = 12.0
CHECKPOINTS_H = [0.75, 1.5, 3.0, 6.0, 12.0]
OUT_DIR = "docs/capcurve_r5"
#: published CEB limeqo_plus checkpoints (BASELINE.md)
BASELINE = [1.293, 1.193, 1.145, 1.100, 1.060]


class BudgetCapStrategy(LimeQOPlusStrategy):
    """Round 5's RETIRED budget-anchored cap (tol <= 2% x time_budget),
    kept runnable for comparison; the main class now carries the
    spent-scaled cap."""

    name = "limeqo_plus_budgetcap"

    def tolerance(self, i: int, j: int) -> float:
        tol = LimeQOStrategy.tolerance(self, i, j)
        if self.model == "tcnn" and self.time_budget:
            tol = min(tol, self.tolerance_budget_frac * self.time_budget)
        return tol


def run_one(cap: str, net_seed: int) -> str:
    wl = Workload.from_reference(*CEB)
    cls = LimeQOPlusStrategy if cap == "spent" else BudgetCapStrategy
    strat = cls(
        wl,
        seed=1,
        time_budget=BUDGET_H * 3600.0,
        max_rounds=1_000_000,
        slack=None,
        model="tcnn",
        net_seed=net_seed,
    )
    records = strat.run()
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{cap}_{net_seed}.json")
    with open(path, "w") as f:
        json.dump(records, f)
    return path


def summarize() -> dict:
    grid = np.asarray([c * 3600.0 for c in CHECKPOINTS_H])
    out: dict = {"checkpoints_h": CHECKPOINTS_H, "baseline_h": BASELINE}
    for cap in ("shipped", "spent"):
        per_init: dict[str, list[float]] = {}
        for seed in range(5):
            path = os.path.join(OUT_DIR, f"{cap}_{seed}.json")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                records = json.load(f)
            per_init[str(seed)] = [
                round(v / 3600.0, 4) for v in interp_run(records, grid)
            ]
        if not per_init:
            continue
        mat = np.asarray(list(per_init.values()))
        out[cap] = {
            "per_init_h": per_init,
            "mean_h": [round(v, 4) for v in mat.mean(axis=0)],
            "median_h": [round(v, 4) for v in np.median(mat, axis=0)],
            "worst_h": [round(v, 4) for v in mat.max(axis=0)],
            "mean_ratio_vs_baseline": [
                round(m / b, 4) for m, b in zip(mat.mean(axis=0), BASELINE)
            ],
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["run", "summarize"])
    ap.add_argument("--cap", choices=["shipped", "spent"])
    ap.add_argument("--net-seed", type=int)
    args = ap.parse_args()
    if args.mode == "run" and (args.cap is None or args.net_seed is None):
        ap.error("run requires --cap and --net-seed")  # ADVICE r5 #1
    if args.mode == "run":
        path = run_one(args.cap, args.net_seed)
        print(json.dumps({"done": path}))
    else:
        print(json.dumps(summarize(), indent=1))


if __name__ == "__main__":
    main()
