"""Offline IVF coarse-quantizer training — regenerates the pinned centroid
literals in ``limeqo_spark/pipeline/_ivf_centers.py``.

Why offline + pinned (VERDICT r8 next-round #2): the IVF cell assignment is
exactly reproducible once the centroids are fixed floats, which upgrades
``ann_ivf_topk`` / ``ann_ivf_partitioned`` from PROP (recall-bar only) to
HASH entries with a DuckDB oracle embedding the same literals — the
``ann_lsh_bucketed`` literal-hyperplane pattern. This matches production IVF
practice too: FAISS-style coarse quantizers are model ARTIFACTS trained once
on a bounded sample and shipped with the index, not refit per query; at
100 TB the refit path is the distributed MLlib trainer
(``train_ivf_centers_distributed``), after which the new centroids get
pinned the same way.

Training recipe (deterministic, no Spark needed): the vec_id-sorted first
4096 embeddings of the largest local fixture (sf0.1), k=16 seeded k-means++
init + 25 Lloyd iterations in float64. Empty-cluster guard: re-seed the
farthest point (never triggers on the fixtures).

Run:  python scripts/train_ivf_centers.py [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

K, SAMPLE, SEED, ITERS = 16, 4096, 42, 25
OUT = "limeqo_spark/pipeline/_ivf_centers.py"


def kmeans_pp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    centers = [x[int(rng.integers(len(x)))]]
    for _ in range(1, k):
        d2 = np.min(
            ((x[:, None, :] - np.asarray(centers)[None]) ** 2).sum(-1), axis=1
        )
        probs = d2 / d2.sum()
        centers.append(x[int(rng.choice(len(x), p=probs))])
    return np.asarray(centers)


def lloyd(x: np.ndarray, k: int, seed: int, iters: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    c = kmeans_pp_init(x, k, rng)
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(k):
            members = x[a == j]
            if len(members):
                c[j] = members.mean(0)
            else:  # farthest-point reseed (deterministic)
                c[j] = x[d2.min(1).argmax()]
    return c


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    x = np.asarray(pdf["embedding"].head(SAMPLE).to_list(), dtype=np.float64)
    centers = lloyd(x, K, SEED, ITERS)
    rows = ",\n".join(
        "    [" + ", ".join(repr(float(v)) for v in row) + "]" for row in centers
    )
    body = (
        '"""Pinned IVF coarse-quantizer centroids (generated file — do not\n'
        "hand-edit). Regenerate with ``python scripts/train_ivf_centers.py``;\n"
        f"recipe: vec_id-sorted first {SAMPLE} embeddings of {sf_dir},\n"
        f"k={K} seeded (seed={SEED}) k-means++ init + {ITERS} Lloyd iterations\n"
        'in float64. See scripts/train_ivf_centers.py for why pinned."""\n\n'
        f"IVF_CENTERS: list[list[float]] = [\n{rows},\n]\n"
    )
    with open(OUT, "w") as f:
        f.write(body)
    d2 = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
    sizes = np.bincount(d2.argmin(1), minlength=K)
    print(f"wrote {OUT}: k={K} dim={centers.shape[1]} cell sizes {sizes.tolist()}")


if __name__ == "__main__":
    main()
