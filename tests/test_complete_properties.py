"""Property-based solver tests (hypothesis): the completion and selection
invariants SURVEY §5.2.3 commits to, over randomized instances rather than
one fixture."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from limeqo_spark.complete import als_complete, censored_als_complete
from limeqo_spark.strategies import rank_cells_by_improvement


def _low_rank_instance(seed: int, n: int, m: int, r: int, density: float):
    rng = np.random.default_rng(seed)
    truth = rng.uniform(0.5, 2.0, (n, r)) @ rng.uniform(0.5, 2.0, (r, m))
    mask = (rng.random((n, m)) < density).astype(np.float64)
    mask[:, 0] = 1.0  # default column always observed (reference invariant)
    return truth, mask


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_als_recovers_low_rank(seed):
    """An exactly rank-2 nonnegative matrix at 60% density completes with
    small relative error on the held-out cells."""
    truth, mask = _low_rank_instance(seed, 40, 12, 2, 0.6)
    done = als_complete(truth, mask, rank=4, iters=60, lam=0.01, seed=0)
    held = mask == 0
    if held.sum() == 0:
        return
    rel = np.abs(done[held] - truth[held]) / truth[held]
    assert np.median(rel) < 0.25, np.median(rel)
    # observed cells are passed through exactly
    np.testing.assert_allclose(done[mask > 0], truth[mask > 0])


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_censored_predictions_respect_cutoffs(seed):
    """Censored cells (runtime known only to exceed a cutoff) must never be
    predicted below their cutoff — the semantics of the reference's clamp
    (matrix_factorization.py:58-59). Exact invariant since the round-4
    repair pass (complete.py): the solve's active-set hinge pulls factors
    toward feasibility and the returned matrix floors censored cells at
    their cutoffs (Hypothesis seed 5381 used to reach 0.39x cutoff)."""
    truth, mask = _low_rank_instance(seed, 30, 10, 2, 0.5)
    rng = np.random.default_rng(seed + 1)
    cutoffs = np.zeros_like(truth)
    cens = (rng.random(truth.shape) < 0.15) & (mask == 0)
    # censor at twice the true value: the model is told "larger than even
    # what the low-rank structure suggests"
    cutoffs[cens] = truth[cens] * 2.0
    done = censored_als_complete(truth, mask, cutoffs, rank=4, iters=60, lam=0.01, seed=0)
    if cens.sum() == 0:
        return
    assert np.all(done[cens] >= cutoffs[cens] * (1 - 1e-9)), (
        float(np.min(done[cens] / cutoffs[cens]))
    )


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    k=st.integers(1, 10),
)
def test_selection_invariants(seed, k):
    """rank_cells_by_improvement: returns <= k cells, all unexplored, in
    non-increasing improvement order, each the per-row argmin of the
    unexplored predictions."""
    rng = np.random.default_rng(seed)
    n, m = 20, 8
    pred = rng.uniform(0.1, 10.0, (n, m))
    explored = (rng.random((n, m)) < 0.3).astype(np.float64)
    explored[:, 0] = 1.0
    min_obs = np.where(
        explored.any(axis=1), np.min(np.where(explored > 0, pred, np.inf), axis=1), np.inf
    )
    cells = rank_cells_by_improvement(pred, explored, min_obs, k)
    assert len(cells) <= k
    improvements = []
    for i, j in cells:
        assert explored[i, j] == 0
        cand = np.where(explored[i] > 0, np.inf, pred[i])
        assert j == int(np.argmin(cand))
        improvements.append((min_obs[i] - cand[j]) / max(cand[j], 1e-9))
        assert improvements[-1] > 0  # only positive-improvement cells
    assert improvements == sorted(improvements, reverse=True)


@given(
    st.lists(st.integers(min_value=1, max_value=10**12), min_size=1, max_size=50)
)
def test_sqrt_temperature_target_arithmetic(counts):
    """The curation targets' overflow-safe split identity holds for any
    count vector: floor(total*w/total_w) == (total DIV tw)*w +
    ((total MOD tw)*w) DIV tw, targets are nonnegative, and their sum
    never exceeds the budget (floor losses only, at most one doc per
    language)."""
    import math

    total = sum(counts)
    ws = [math.floor(math.sqrt(c) * 1000) for c in counts]
    tw = sum(ws)
    targets = []
    for w in ws:
        split = (total // tw) * w + ((total % tw) * w) // tw
        assert split == (total * w) // tw  # the identity the SQL relies on
        targets.append(split)
    assert all(t >= 0 for t in targets)
    assert total - len(counts) < sum(targets) + len(counts)
    assert sum(targets) <= total
