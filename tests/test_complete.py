"""Solver property tests (SURVEY §5.2.3)."""

from __future__ import annotations

import numpy as np
import pytest

from limeqo_spark.complete import als_complete, complete_log_space
from limeqo_spark.workload import Workload


def test_als_recovers_low_rank_matrix():
    """(a) exact low-rank matrix, enough observations to be well-posed
    (density 0.3 => ~2900 obs vs ~750 params at rank 3) -> held-out RMSE
    near zero."""
    wl = Workload.synthetic_low_rank(
        n_rows=200, n_cols=49, rank=3, noise=0.0, seed=7, density=0.3
    )
    done = als_complete(wl.matrix, wl.mask, rank=3, iters=60, lam=0.01, seed=1)
    held_out = wl.mask == 0
    rmse = float(np.sqrt(np.mean((done[held_out] - wl.matrix[held_out]) ** 2)))
    scale = float(np.mean(np.abs(wl.matrix[held_out])))
    assert rmse / scale < 0.05, f"relative RMSE {rmse/scale:.3f}"


def test_censored_als_respects_cutoffs():
    """(b) censored cells: predictions must not sit (far) below active
    cutoffs — the censoring clamp pulls imputations up."""
    wl = Workload.synthetic_low_rank(n_rows=120, n_cols=20, rank=3, noise=0.05, seed=3)
    rng = np.random.default_rng(0)
    cutoffs = np.zeros_like(wl.matrix)
    cens = (rng.random(wl.matrix.shape) < 0.05) & (wl.mask == 0)
    # censor at 2x the true value: the solver only knows "latency > cutoff"
    cutoffs[cens] = wl.matrix[cens] * 2.0
    done = als_complete(wl.matrix, wl.mask, rank=4, iters=60, lam=0.05, seed=2, cutoffs=cutoffs)
    viol = done[cens] < cutoffs[cens] * 0.7  # allow solver slack
    assert viol.mean() < 0.25, f"{viol.mean():.2%} of censored cells far below cutoff"


def test_log_space_pipeline_preserves_observed():
    wl = Workload.synthetic_low_rank(seed=11)
    res = complete_log_space(wl.matrix, wl.mask, rank=4, iters=30)
    obs = wl.mask > 0
    np.testing.assert_allclose(res.completed[obs], wl.matrix[obs])
    assert (res.completed >= 0).all()


@pytest.mark.parametrize("ds", ["job"])
def test_reference_matrix_loads_and_completes(ds):
    """(c) smoke on the reference's own shipped matrix (smallest: JOB)."""
    wl = Workload.from_reference(
        f"/root/reference/dataset/{ds}-matrix.csv",
        f"/root/reference/dataset/init_{ds}_mask.npy",
    )
    assert wl.matrix.shape == (113, 49)
    assert wl.mask[:, 0].all(), "default plan column must be fully observed"
    assert wl.opt_time < wl.default_time
    res = complete_log_space(wl.matrix, wl.mask, rank=5, iters=50)
    assert np.isfinite(res.completed).all()
    assert (res.completed >= 0).all()
