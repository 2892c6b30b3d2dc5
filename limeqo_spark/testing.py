"""Oracle-parity comparison harness mirroring the driver's t2 gate:
column names matched (order-insensitive), rows sorted, values compared
EXACTLY (the driver hashes, so a one-ulp float drift is a failure —
queries are written so both engines produce identical bits).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import Any

import pandas as pd


def _canon(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return False, f"column mismatch: spark={sc} oracle={oc}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if a == b:
        return True, "ok"
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
    return False, f"value mismatch, first diffs: {diffs} (cols={sc})"
