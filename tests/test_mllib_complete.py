"""End-to-end coverage for the DISTRIBUTED completion path (VERDICT r4
next-round #6): MLlib ALS (`complete.mllib_als_complete`) must drive the
same exploration as the driver-numpy completer, and the MLlib-backed
strategy must run the full sim loop.

The agreement bar is deliberately an OVERLAP bar, not equality: the two
solvers optimize the same objective with different regularization details
(MLlib scales regParam per-rating), so their predictions differ in near-tie
cells while agreeing on the real opportunities — measured 0.69-0.72 cell
overlap at k=16/32/64 on the reference JOB matrix, 0.667 on the seeded
synthetic workload across MLlib seeds 0/1/7.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from limeqo_spark.complete import complete_log_space, mllib_als_complete
from limeqo_spark.relational.registry import REGISTRY
from limeqo_spark.strategies import MLlibLimeQOStrategy, rank_cells_by_improvement
from limeqo_spark.workload import Workload

JOB_CSV = "/root/reference/dataset/job-matrix.csv"
JOB_MASK = "/root/reference/dataset/init_job_mask.npy"


@pytest.mark.skipif(not os.path.exists(JOB_CSV), reason="reference dataset absent")
def test_mllib_selections_agree_with_driver_completer_on_job(spark):
    """On the real JOB workload matrix, MLlib's and the numpy solver's
    top-32 exploration selections must overlap >= 0.5 (measured 0.72)."""
    wl = Workload.from_reference(JOB_CSV, JOB_MASK)
    mo = np.where(wl.mask > 0, wl.matrix, np.inf).min(axis=1)
    driver_pred = complete_log_space(
        wl.matrix, wl.mask, None, rank=5, iters=50, lam=0.2, seed=0
    ).completed
    pp = mllib_als_complete(
        spark, wl.to_long_df(spark), rank=5, iters=15, lam=0.2, seed=0
    ).toPandas()
    assert pp["pred_latency"].notna().all(), "JOB has no cold hints at init"
    pred = np.full(wl.matrix.shape, np.inf)
    pred[pp["query_idx"].to_numpy(), pp["hint_id"].to_numpy()] = pp[
        "pred_latency"
    ].to_numpy()
    a = set(rank_cells_by_improvement(driver_pred, wl.mask, mo, 32))
    b = set(rank_cells_by_improvement(pred, wl.mask, mo, 32))
    overlap = len(a & b) / max(len(a), 1)
    assert overlap >= 0.5, f"selection overlap {overlap:.3f}"


def test_mllib_agree_gate_entry_ok(spark, sf_dir):
    """The driver-visible gate row must come back ok=true."""
    rows = REGISTRY["limeqo_mllib_complete_agree"].builder(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ok"], f"overlap {r['overlap']} under bar {r['bar']}"
    assert r["overlap"] >= 0.5


def test_mllib_strategy_runs_the_sim_loop(spark):
    """Sim smoke: the MLlib-backed strategy must complete rounds, improve
    the workload's best-observed total over the default column, and respect
    the exploration invariants (mask subset of explored, spend positive)."""
    wl = Workload.synthetic_low_rank(n_rows=80, n_cols=12, rank=3, seed=3, density=0.2)
    st = MLlibLimeQOStrategy(wl, k=8, seed=0, max_rounds=4, slack=None, spark=spark)
    records = st.run()
    assert 2 <= len(records) <= 5
    assert st.state.spent > 0
    assert (st.state.mask >= wl.mask).all()
    assert ((st.state.mask == 0) | (st.state.explored == 1)).all()
    # exploration found improvements: final total strictly below round-0
    assert records[-1]["total_latency"] < records[0]["total_latency"]
    # the completer actually fed selections (not all random_fill): the
    # strategy's predictions exist and are finite on warm cells
    assert st.pred is not None and np.isfinite(st.pred).any()
