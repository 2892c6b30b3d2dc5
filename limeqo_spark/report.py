"""Figure/report pipeline (SURVEY A34): turn per-round metric JSONs from
:mod:`limeqo_spark.run_experiment` into the reference's summary artifacts —
runs interpolated onto a common exploration-time grid, mean +/- std bands,
and the checkpoint table shape of ``result/{ds}.csv``.

Re-derivation of the logic in the reference's ``draw/draw_*_fig1.ipynb``
notebooks (cells 2-7: load result JSONs, ``interp1d`` onto a shared grid,
average the 20 runs, extract checkpoints) as a plain library + CLI instead
of notebooks. Curves are (exec_time -> total_latency); total_latency is a
step function that only drops at observation events, so like the reference
we linearly interpolate between recorded rounds.
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import re
from dataclasses import dataclass

import numpy as np


@dataclass
class Curve:
    """One strategy's averaged exploration curve on a common time grid."""

    strategy: str
    grid: np.ndarray  # exploration seconds
    mean: np.ndarray  # mean total workload latency across reps
    std: np.ndarray
    n_reps: int


def load_runs(exp_dir: str, strategy: str) -> list[list[dict]]:
    """All reps' metric records for one strategy (``{strategy}_{rep}.json``)."""
    runs = []
    for path in sorted(glob.glob(os.path.join(exp_dir, f"{strategy}_*.json"))):
        if not re.fullmatch(rf"{re.escape(strategy)}_\d+\.json", os.path.basename(path)):
            continue  # don't let 'limeqo' glob up 'limeqo_plus' files
        with open(path) as f:
            runs.append(json.load(f))
    return runs


def interp_run(records: list[dict], grid: np.ndarray) -> np.ndarray:
    """One run's total_latency sampled at each grid time. Outside the
    recorded range np.interp clamps to the end values, matching the
    notebooks' treatment of runs that stop early (converged runs hold
    their final latency)."""
    x = np.asarray([r["exec_time"] for r in records], dtype=np.float64)
    y = np.asarray([r["total_latency"] for r in records], dtype=np.float64)
    order = np.argsort(x, kind="stable")
    return np.interp(grid, x[order], y[order])


def curve(exp_dir: str, strategy: str, grid: np.ndarray) -> Curve | None:
    runs = load_runs(exp_dir, strategy)
    if not runs:
        return None
    ys = np.stack([interp_run(r, grid) for r in runs])
    return Curve(strategy, grid, ys.mean(axis=0), ys.std(axis=0), len(runs))


def checkpoint_table(
    exp_dir: str, strategies: list[str], checkpoints: list[float]
) -> list[dict]:
    """The ``result/{ds}.csv`` shape: one row per checkpoint time, one
    column per strategy, cell = mean total workload latency at that much
    exploration (draw_ceb_fig1.ipynb cell 7)."""
    grid = np.asarray(checkpoints, dtype=np.float64)
    curves = {s: curve(exp_dir, s, grid) for s in strategies}
    rows = []
    for idx, t in enumerate(checkpoints):
        row: dict = {"exploration_time": t}
        for s, c in curves.items():
            row[s] = float(c.mean[idx]) if c is not None else None
        rows.append(row)
    return rows


def write_checkpoint_csv(rows: list[dict], path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--strategies", default="oracle,random,greedy,limeqo")
    ap.add_argument(
        "--checkpoints", default="45,90,180,360,720", help="exploration seconds"
    )
    ap.add_argument("--out", default=None, help="CSV path (default: stdout JSON)")
    args = ap.parse_args()
    rows = checkpoint_table(
        args.exp_dir,
        args.strategies.split(","),
        [float(c) for c in args.checkpoints.split(",")],
    )
    if args.out:
        write_checkpoint_csv(rows, args.out)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
