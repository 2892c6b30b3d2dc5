"""SQL-string literal builders for large numeric constants.

Building a (64 x 64) plane matrix with nested ``F.array(F.lit(...))`` costs
thousands of py4j round trips — measured ~2.4 s of pure driver time per
builder invocation (opt r11, guide §7.3: driver work is single-threaded and
serial with every query the session runs). Rendering the same constant as
ONE SQL literal string handed to ``F.expr`` is a single py4j call and
parses in milliseconds.

Exactness: ``repr(float(v))`` is the shortest decimal that round-trips to
the same IEEE double in Python, and Spark's SQL parser (Java
``Double.parseDouble``) maps it back to the identical bit pattern — the
bit-exactness of the swap is asserted by ``tests/test_sqlexpr.py``.
"""

from __future__ import annotations

from collections.abc import Iterable


def double_lit(v: float) -> str:
    """One double literal, bit-exact round trip (``1.5D``, ``1e-05D``)."""
    return repr(float(v)) + "D"


def array_lit(vals: Iterable[float]) -> str:
    """``array(1.0D, ...)`` literal for a 1-D float sequence."""
    return "array(" + ",".join(double_lit(v) for v in vals) + ")"


def matrix_lit(rows: Iterable[Iterable[float]]) -> str:
    """``array(array(...), ...)`` literal for a 2-D float matrix."""
    return "array(" + ",".join(array_lit(r) for r in rows) + ")"
