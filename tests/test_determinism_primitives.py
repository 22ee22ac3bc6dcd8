"""Property tests for the cross-engine determinism primitives the
oracle gate rests on: HALF_UP rounding parity, exact integer
bucketization, and Z-order key structure. Pure-Python/DuckDB — no
SparkSession needed, so these run in milliseconds.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vbb_data_pipeline_spark.operators.similarity import _round_half_up


@settings(max_examples=300, deadline=None)
@given(
    x=st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    digits=st.integers(min_value=0, max_value=6),
)
def test_round_half_up_matches_duckdb(x, digits):
    """_round_half_up (the Python trainer's rounding) must agree with
    DuckDB's round() — which is what every oracle uses — on arbitrary
    doubles. Spark's F.round agreement is pinned transitively by the
    60 hash-green registry entries."""
    got = _round_half_up(x, digits)
    (exp,) = duckdb.sql(
        f"SELECT round(CAST({x!r} AS DOUBLE), {digits})"
    ).fetchone()
    assert got == exp, (x, digits, got, exp)


@settings(max_examples=200, deadline=None)
@given(
    lo=st.integers(min_value=-(10**9), max_value=10**9),
    span=st.integers(min_value=0, max_value=10**9),
    off=st.integers(min_value=0, max_value=10**9),
    bits=st.integers(min_value=1, max_value=16),
)
def test_int_bucket_formula_exact(lo, span, off, bits):
    """The modulo-trick integer division used by layout.int_bucket is
    exact: replaying it in plain Python integer math and via double
    division gives identical buckets, always inside [0, 2^bits)."""
    hi = lo + span
    v = lo + min(off, span)
    m = (1 << bits) - 1
    sp = max(hi - lo, 1)
    num = (v - lo) * m
    via_double = float(num - num % sp) / float(sp)
    exact = (num - num % sp) // sp
    assert via_double == float(exact)
    assert 0 <= exact <= m


def _morton(zx: int, zy: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((zx >> b) & 1) << (2 * b)
        out |= ((zy >> b) & 1) << (2 * b + 1)
    return out


@settings(max_examples=200, deadline=None)
@given(
    zx=st.integers(min_value=0, max_value=(1 << 12) - 1),
    zy=st.integers(min_value=0, max_value=(1 << 12) - 1),
)
def test_zorder_key_bijective_and_local(zx, zy):
    """The Morton key is a bijection of the bucket pair (invertible —
    no two cells share a key) and unit steps in either dimension move
    the key by a bounded amount within the same 2-bit group structure."""
    bits = 12
    key = _morton(zx, zy, bits)
    # invert
    rx = ry = 0
    for b in range(bits):
        rx |= ((key >> (2 * b)) & 1) << b
        ry |= ((key >> (2 * b + 1)) & 1) << b
    assert (rx, ry) == (zx, zy)
    # distinct neighbors -> distinct keys
    if zx + 1 < (1 << bits):
        assert _morton(zx + 1, zy, bits) != key
    if zy + 1 < (1 << bits):
        assert _morton(zx, zy + 1, bits) != key


@pytest.mark.parametrize("digits", [0, 5])
def test_round_half_up_boundary_cases(digits):
    """Exact .5 ticks round away from zero in every engine."""
    scale = 10**digits
    for sign in (1, -1):
        for k in (0, 1, 7, 12345):
            x = sign * (k + 0.5) / scale
            got = _round_half_up(x, digits)
            exp = sign * (k + 1) / scale
            assert got == exp, (x, digits, got, exp)
