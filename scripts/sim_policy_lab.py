#!/usr/bin/env python
"""Round-3 exploration-policy lab: CEB @0.75h LimeQO+ variants.

Each variant is a small subclass of the shipped strategies; run with
``python scripts/sim_policy_lab.py [variant ...]`` and compare final
workload hours across seeds. Results land in docs/ once conclusive.
"""

from __future__ import annotations

import json
import sys

import numpy as np

from limeqo_spark.complete import als_complete
from limeqo_spark.strategies import (
    LimeQOPlusStrategy,
    LimeQOStrategy,
    rank_cells_by_improvement,
)
from limeqo_spark.workload import Workload

CEB = (
    "/root/reference/dataset/ceb-matrix.csv",
    "/root/reference/dataset/init_ceb_mask.npy",
)
BUDGET = 0.75 * 3600


class RestartPartitionALS(LimeQOPlusStrategy):
    """k split across the n restarts' INDIVIDUAL predictions (keeps each
    restart's optimistic noise) instead of ranking on the mean."""

    name = "limeqo_plus_partition"

    def fit(self) -> None:
        st = self.state
        log_m = np.log1p(np.where(st.mask > 0, self.wl.matrix, 0.0))
        log_cut = np.log1p(st.cutoffs)
        self.preds = []
        for _ in range(self.n_restarts):
            done = als_complete(
                log_m, st.mask, self.rank, self.iters, self.lam,
                seed=int(self.rng.integers(2**31)), nonnegative=True,
                cutoffs=log_cut,
            )
            self.preds.append(np.expm1(done))
        self.pred = np.mean(self.preds, axis=0)

    def select(self):
        st = self.state
        mo = st.min_observed()
        # each restart ranks k candidates; interleave round-robin so every
        # restart contributes equally (restart 1's #1, restart 2's #1, ...,
        # restart 1's #2, ...) until k distinct cells are chosen
        ranked = [
            rank_cells_by_improvement(p, st.explored, mo, self.k)
            for p in self.preds
        ]
        out: list[tuple[int, int]] = []
        taken: set[tuple[int, int]] = set()
        for depth in range(self.k):
            for lst in ranked:
                if depth < len(lst) and lst[depth] not in taken:
                    taken.add(lst[depth])
                    out.append(lst[depth])
                    if len(out) >= self.k:
                        break
            if len(out) >= self.k:
                break
        return self.random_fill(out)


class ColumnPriorALS(LimeQOPlusStrategy):
    """Mean-of-restarts ALS prediction, but candidate ranking discounts
    predictions on hints with a high observed win-rate (column prior)."""

    name = "limeqo_plus_colprior"
    gamma = 0.5

    def select(self):
        st = self.state
        assert self.pred is not None
        masked = np.where(st.mask > 0, self.wl.matrix, np.inf)
        rows = np.isfinite(masked.min(axis=1))
        argm = masked[rows].argmin(axis=1)
        prior = np.bincount(argm, minlength=self.wl.matrix.shape[1]).astype(float)
        prior /= max(prior.sum(), 1.0)
        discount = (1.0 + prior / max(prior.max(), 1e-9)) ** self.gamma
        adj = self.pred / discount[None, :]
        out = rank_cells_by_improvement(adj, st.explored, st.min_observed(), self.k)
        return self.random_fill(out)


class TCNNDecay(LimeQOPlusStrategy):
    """Shipped tcnn model with embedding weight decay (the NumpyTCNN
    docstring's own recommendation; routed through the shipped
    ``tcnn_weight_decay`` attribute so the fit loop stays shared)."""

    name = "limeqo_plus_tcnn_wd"
    tcnn_weight_decay = 1e-3

    def __init__(self, *a, **kw):
        kw["model"] = "tcnn"
        super().__init__(*a, **kw)


VARIANTS = {
    "shipped_als": lambda wl, s: LimeQOPlusStrategy(
        wl, seed=s, max_rounds=100_000, time_budget=BUDGET
    ),
    "limeqo_k8": lambda wl, s: LimeQOStrategy(
        wl, k=8, seed=s, max_rounds=100_000, time_budget=BUDGET
    ),
    "partition": lambda wl, s: RestartPartitionALS(
        wl, seed=s, max_rounds=100_000, time_budget=BUDGET
    ),
    "colprior": lambda wl, s: ColumnPriorALS(
        wl, seed=s, max_rounds=100_000, time_budget=BUDGET
    ),
    "tcnn_wd": lambda wl, s: TCNNDecay(
        wl, seed=s, max_rounds=100_000, time_budget=BUDGET
    ),
    # the shipped bench primary: deterministic across s (see
    # docs/tcnn_sim_study_r3.json pinned_init_determinism)
    "tcnn_pinned": lambda wl, s: LimeQOPlusStrategy(
        wl, seed=s, max_rounds=100_000, time_budget=BUDGET,
        model="tcnn", net_seed=3,
    ),
}


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    seeds = [1, 2, 3]
    wl = Workload.from_reference(*CEB)
    results: dict[str, dict] = {}
    for name in names:
        finals = []
        for s in seeds:
            rec = VARIANTS[name](wl, s).run()
            finals.append(round(rec[-1]["total_latency"] / 3600, 4))
        results[name] = {"seeds": finals, "mean": round(float(np.mean(finals)), 4)}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
