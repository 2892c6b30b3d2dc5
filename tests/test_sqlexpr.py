"""Bit-exactness of the SQL-string literal builders (opt r11): swapping
nested F.lit trees for one rendered SQL literal must never change a single
bit of any constant, or every pinned-centroid oracle hash breaks."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from limeqo_spark.sqlexpr import array_lit, double_lit, matrix_lit


@pytest.fixture(scope="module")
def spark():
    from limeqo_spark.session import get_spark

    return get_spark("test_sqlexpr", master="local[2]", shuffle_partitions=2)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_double_array_matrix_bit_exact(spark):
    rng = np.random.default_rng(7)
    vals = [float(v) for v in rng.standard_normal(64)] + [
        0.0, -0.0, 1e-300, -1e300, 0.1 + 0.2, float(np.nextafter(1.0, 2.0)),
    ]
    got = spark.range(1).select(F.expr(array_lit(vals)).alias("a")).head()["a"]
    want = spark.range(1).select(
        F.array(*[F.lit(v) for v in vals]).alias("a")
    ).head()["a"]
    assert all(_bits(g) == _bits(w) for g, w in zip(got, want))
    assert len(got) == len(vals)

    m = rng.standard_normal((8, 16))
    gm = spark.range(1).select(F.expr(matrix_lit(m)).alias("m")).head()["m"]
    for row, grow in zip(m, gm):
        assert all(_bits(float(v)) == _bits(g) for v, g in zip(row, grow))


def test_double_lit_repr_forms():
    assert double_lit(1.5) == "1.5D"
    assert double_lit(1e-05).endswith("D")
