"""Datashift / new-query experiment (reference `experiment/stack-datashift/`,
`draw/draw_newquery.ipynb`): exploration starts on a subset of the workload;
mid-run a batch of NEW queries arrives (with only their default-plan runtime
observed — they have just been run once under the optimizer default), and the
strategy must fold them into its model and re-converge.

This is the reference's robustness story for workload drift: the curve jumps
up at injection (the new defaults join the total-latency sum) and then
descends again as the completer extrapolates the new rows from the hint
factors it already learned. The analog of the notebook's `new=True` exec-time
bookkeeping is the explicit `inject_round` marker in the result.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from limeqo_spark.strategies import STRATEGIES, SimState, Strategy
from limeqo_spark.workload import Workload


@dataclass
class DatashiftResult:
    records: list[dict]  # concatenated metric records, both phases
    inject_round: int  # index into records where the new rows appeared
    holdout_rows: list[int] = field(default_factory=list)
    #: derived bounds of the FULL workload for invariant checks
    default_time: float = 0.0
    opt_time: float = 0.0


def run_datashift(
    wl: Workload,
    strategy: str = "limeqo",
    holdout_frac: float = 0.2,
    budget_before: float | None = None,
    budget_after: float | None = None,
    seed: int = 0,
    k: int = 8,
    **strategy_kw,
) -> DatashiftResult:
    """Run ``strategy`` on 1-holdout_frac of ``wl``'s rows for
    ``budget_before`` exploration seconds, inject the held-out rows with
    ONLY their default plan observed (mask col 0 — the reference invariant
    for newly-arrived queries), carry every observation/censor/explored flag
    over, and continue for ``budget_after`` seconds."""
    cls = STRATEGIES[strategy]
    rng = np.random.default_rng(seed)
    q = wl.matrix.shape[0]
    held = np.zeros(q, dtype=bool)
    held[rng.choice(q, size=int(round(holdout_frac * q)), replace=False)] = True
    kept = ~held

    wl_sub = Workload(
        wl.matrix[kept], wl.mask[kept], [wl.query_ids[i] for i in np.flatnonzero(kept)]
    )
    s1: Strategy = cls(wl_sub, k=k, seed=seed, time_budget=budget_before, **strategy_kw)
    rec1 = s1.run()

    # full-workload phase: kept rows carry their explored/censored state,
    # held rows arrive with only the default column observed
    mask2 = np.zeros_like(wl.mask, dtype=np.float64)
    mask2[kept] = s1.state.mask
    mask2[held, 0] = 1.0
    wl_full = Workload(wl.matrix, mask2, list(wl.query_ids))
    s2: Strategy = cls(
        wl_full,
        k=k,
        seed=seed + 1,
        time_budget=(s1.state.spent + budget_after) if budget_after is not None else None,
        **strategy_kw,
    )
    state2 = SimState.fresh(wl_full)
    state2.cutoffs[kept] = s1.state.cutoffs
    state2.explored[kept] = np.maximum(state2.explored[kept], s1.state.explored)
    state2.spent = s1.state.spent
    state2.cells_explored = s1.state.cells_explored
    s2.state = state2
    rec2 = s2.run()

    return DatashiftResult(
        records=rec1 + rec2,
        inject_round=len(rec1),
        holdout_rows=[int(i) for i in np.flatnonzero(held)],
        default_time=float(wl.matrix[:, 0].sum()),
        opt_time=float(wl.matrix.min(axis=1).sum()),
    )
