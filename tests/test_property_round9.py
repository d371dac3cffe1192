"""Property layer for the round-9 integer-exact derivations
(extends tests/test_property_round8.py): pure-Python hypothesis checks
that quality_model_train's fixed-point forms equal the textbook
rational definitions. No Spark session — these pin the ARITHMETIC
identities both engines evaluate, at thousands of random points.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st


def _tdiv(a: int, b: int) -> int:
    """Sign-split truncating division (Spark `div` == DuckDB `//` on
    non-negative numerators; the sign split makes them agree for a<0)."""
    assert b > 0
    return a // b if a >= 0 else -((-a) // b)


def _p6(z6: int) -> int:
    """Integer Elliott sigmoid in e6 units — the expression both engines
    evaluate in quality_model_train's forward pass."""
    return 500000 + _tdiv(z6 * 1000000, 2 * (1000000 + abs(z6)))


@settings(max_examples=500)
@given(st.integers(-10**15, 10**15), st.integers(1, 10**12))
def test_tdiv_is_truncation_of_exact_fraction(a, b):
    """Sign-split integer division == trunc toward zero of the exact
    rational a/b — so Spark's `div` (trunc) and DuckDB's `//` (floor)
    agree once numerators are made non-negative."""
    f = Fraction(a, b)
    trunc = int(f) if f >= 0 else -int(-f)
    assert _tdiv(a, b) == trunc


@settings(max_examples=500)
@given(st.integers(-10**9, 10**9))
def test_elliott_sigmoid_integer_form(z6):
    """p6 equals the Elliott (1993) sigmoid 1/2 + z/(2(1+|z|)) evaluated
    in exact rationals and truncated to e6 — within the single-ulp
    truncation the fixed-point form defines."""
    z = Fraction(z6, 10**6)
    exact = Fraction(1, 2) + z / (2 * (1 + abs(z)))
    scaled = exact * 10**6
    lo = int(scaled) if scaled >= 0 else -int(-scaled)
    got = _p6(z6)
    # the integer form truncates the (signed) offset term toward zero:
    # it is exactly the truncated rational, never further than 1 off.
    assert abs(got - lo) <= 1
    assert 0 <= got <= 10**6


@settings(max_examples=500)
@given(st.integers(-10**9, 10**9), st.integers(-10**9, 10**9))
def test_elliott_sigmoid_monotone_and_symmetric(a, b):
    """Monotone nondecreasing in z; p(z) + p(-z) == 1e6 (the symmetry
    the sign-split truncation preserves exactly)."""
    if a > b:
        a, b = b, a
    assert _p6(a) <= _p6(b)
    assert _p6(a) + _p6(-a) == 10**6


@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(
            st.integers(-10000, 10000),
            st.integers(-10000, 10000),
            st.integers(-10000, 10000),
            st.integers(-10000, 10000),
            st.integers(0, 1),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_gd_epoch_matches_fraction_arithmetic(rows):
    """One integer GD epoch from zero weights equals the same epoch
    evaluated in exact Fractions with truncation applied at exactly the
    spec's two points (z6 quantization; the lr*mean-gradient step) —
    i.e. the fixed-point fold introduces NO other rounding."""
    lr, n = 4, len(rows)
    # integer fold (the engines' form) — weights start at 0, so epoch 1
    # has z=0, p=500000 for every row: gradient is exact there, and the
    # property still exercises the step truncation.
    g_int = [0] * 5
    for (x1, x2, x3, x4, y) in rows:
        xs = (10000, x1, x2, x3, x4)
        err = 500000 - y * 1000000
        for j, xj in enumerate(xs):
            g_int[j] += err * xj
    w_int = [-_tdiv(lr * gj, n * 10000) for gj in g_int]

    # exact-rational twin: gradient term (p - y) * x with p = 1/2
    w_frac = []
    for j in range(5):
        g = sum(
            (Fraction(1, 2) - y) * Fraction((10000, x1, x2, x3, x4)[j], 10000)
            for (x1, x2, x3, x4, y) in rows
        )
        step = Fraction(lr) * g / n  # real-unit step
        scaled = -step * 10**6
        w_frac.append(int(scaled) if scaled >= 0 else -int(-scaled))
    assert w_int == w_frac
