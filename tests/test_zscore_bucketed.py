"""Randomized equivalence: events_zscore_anomaly_bucketed must reproduce the
flat formulation row-for-row on adversarial event streams — the carry logic
(prefix-last-20 rows replicated into later buckets) is only correct if it
survives sparse buckets (a trailing frame spanning SEVERAL earlier buckets),
multi-week gaps, timestamp ties, and types with fewer rows than the
lookback. The oracle-parity test covers the fixture distribution; this one
covers the distributions the fixture doesn't have."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from limeqo_spark.manifest import REGISTRY
from limeqo_spark.relational.queries_events import ZSCORE_BUCKET_US, events_zscore

WEEK_S = ZSCORE_BUCKET_US // 1_000_000


def _synth_events(seed: int) -> pd.DataFrame:
    """Event stream engineered against the carry logic: per-type bursts
    separated by multi-week silences, buckets holding fewer rows than the
    lookback, duplicate timestamps (event_id tiebreak), and one type with
    barely more rows than ZSCORE_MIN_N."""
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    base = 1_700_000_000  # any fixed epoch anchor
    for t_idx, etype in enumerate(["alpha", "beta", "gamma"]):
        n = [400, 37, 12][t_idx]
        ts = base
        for _ in range(n):
            gap = int(
                rng.choice(
                    # seconds .. minutes .. a sparse-bucket jump of 1-4 weeks
                    [1, 60, 3600, WEEK_S * int(rng.integers(1, 5))],
                    p=[0.55, 0.25, 0.1, 0.1],
                )
            )
            ts += gap
            if rng.random() < 0.15:
                ts -= gap  # duplicate timestamp: exercises the event_id tie
            # heavy-tailed values so 3-sigma actually fires
            val = float(rng.lognormal(3.0, 1.2))
            rows.append((eid, ts, int(rng.integers(0, 9)), etype, round(val, 2)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts_s", "user_id", "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts_s"], unit="s")
    df["props"] = '{"k": 1}'
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_bucketed_equals_flat_on_adversarial_streams(spark, tmp_path, seed):
    pdf = _synth_events(seed)
    sf_dir = str(tmp_path / f"sf_synth_{seed}")
    spark.createDataFrame(pdf).coalesce(3).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet"
    )
    # the flat form is a TEST-ONLY reference since r11 (demoted from the
    # manifest for its single-key window partition) — import it directly
    flat = events_zscore(spark, sf_dir).toPandas()
    bucketed = (
        REGISTRY["events_zscore_anomaly_bucketed"].builder(spark, sf_dir).toPandas()
    )
    assert len(flat) > 0, "the synthetic stream should produce anomalies"
    pd.testing.assert_frame_equal(
        flat.reset_index(drop=True), bucketed.reset_index(drop=True)
    )
