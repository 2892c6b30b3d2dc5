#!/usr/bin/env python
"""Measurement-noise robustness study: the reference simulates execution as
a lookup of a FIXED pre-measured runtime, but a live cluster returns noisy
measurements. This study runs LimeQO against a noise-corrupted matrix —
the model, the censoring decisions, and the best-observed selection all
see ``true * LogNormal(0, sigma)`` — and scores the end state the way
production would experience it: each query deploys the hint with the best
NOISY observation, at its TRUE cost. (Initially-observed mask cells keep
their true values: they were measured before our exploration started.)

Usage: python scripts/noise_robustness.py [sigma ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from limeqo_spark.strategies import LimeQOStrategy
from limeqo_spark.workload import Workload

CEB = (
    "/root/reference/dataset/ceb-matrix.csv",
    "/root/reference/dataset/init_ceb_mask.npy",
)
BUDGET = 0.75 * 3600


def classwise_noise(
    true: np.ndarray, sigma: float, rng, mask: np.ndarray | None = None
) -> np.ndarray:
    """One lognormal draw per (row, distinct value) — i.e. per measured
    PLAN, not per cell. The sim's plan-equivalence dedup groups cells by
    exact value equality (SimState.reveal_or_censor), mirroring the
    reference's a-priori union-find over hint_list: equivalence comes
    from EXPLAIN, which measurement noise does not touch. Per-cell
    independent noise would silently split those classes and charge the
    explorer for re-measuring plans it would never re-measure."""
    noisy = np.empty_like(true)
    for i in range(true.shape[0]):
        row = true[i]
        draws = {v: float(np.exp(rng.normal(0.0, sigma))) for v in np.unique(row)}
        if mask is not None:
            # plans already measured before exploration started (the init
            # mask) keep their TRUE value for the WHOLE equivalence class —
            # a per-class reset, or the class would split against its own
            # pre-measured member
            for v in np.unique(row[mask[i] > 0]):
                draws[v] = 1.0
        noisy[i] = [row[j] * draws[row[j]] for j in range(len(row))]
    return noisy


def main() -> None:
    sigmas = [float(x) for x in sys.argv[1:]] or [0.0, 0.1, 0.2, 0.4]
    wl = Workload.from_reference(*CEB)
    true = wl.matrix.copy()
    out = {
        "setup": "CEB, LimeQO k=8, 0.75 h budget, seeds 1-3; multiplicative "
        "lognormal noise per measured PLAN (one draw per row-distinct "
        "value, preserving the sim's plan-equivalence classes); "
        "'deployed' = true cost of each query's best-noisy-observation hint",
        "default_h": round(wl.default_time / 3600, 4),
    }
    for sigma in sigmas:
        finals = []
        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed + 1000)
            noisy = (
                classwise_noise(true, sigma, rng, wl.mask)
                if sigma
                else true.copy()
            )
            wl.matrix = noisy
            try:
                strat = LimeQOStrategy(
                    wl, k=8, seed=seed, max_rounds=100_000, time_budget=BUDGET
                )
                strat.run()
                obs = np.where(strat.state.mask > 0, noisy, np.inf)
                choice = obs.argmin(axis=1)
            finally:
                wl.matrix = true
            finals.append(
                round(float(true[np.arange(len(choice)), choice].sum()) / 3600, 4)
            )
        out[f"sigma={sigma}"] = {
            "seeds": finals,
            "mean": round(float(np.mean(finals)), 4),
        }
        print(sigma, out[f"sigma={sigma}"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
