"""Property layer for the round-9 SECOND-WAVE derivations (extends
tests/test_property_round9b.py): pure-Python hypothesis checks that the
integer / lattice forms used by shapley_channel_attribution,
mcnemar_test, mantel_haenszel_or, brier_decomposition and the
quantized-OLS law fits equal the textbook definitions EXACTLY (Fraction
arithmetic or exhaustive enumeration, no floats on the reference side).
No Spark session — these pin the arithmetic identities both engines
evaluate, at thousands of random points."""

from __future__ import annotations

import itertools
import math
from fractions import Fraction

from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------------
# Shapley: the coalition-lattice times-k! integer form vs the
# permutation definition, enumerated exhaustively.
# ---------------------------------------------------------------------

def _lattice_phi_num(k: int, c: dict[int, int]) -> list[int]:
    """The engines' form: phi_i * k! = sum over S w/o i of
    |S|!(k-1-|S|)! * (v(S+i) - v(S)), with v(S) = sum of c[T] for
    T subset of S."""
    def v(S: int) -> int:
        return sum(cv for T, cv in c.items() if (T & S) == T)

    out = []
    for i in range(k):
        bit = 1 << i
        tot = 0
        for S in range(1 << k):
            if S & bit:
                continue
            s = bin(S).count("1")
            tot += (
                math.factorial(s)
                * math.factorial(k - 1 - s)
                * (v(S | bit) - v(S))
            )
        out.append(tot)
    return out


def _permutation_phi(k: int, c: dict[int, int]) -> list[Fraction]:
    """Textbook Shapley: average over ALL k! orderings of the marginal
    contribution of i when it joins the prefix coalition."""
    def v(S: int) -> int:
        return sum(cv for T, cv in c.items() if (T & S) == T)

    acc = [Fraction(0)] * k
    perms = list(itertools.permutations(range(k)))
    for perm in perms:
        S = 0
        for i in perm:
            bit = 1 << i
            acc[i] += v(S | bit) - v(S)
            S |= bit
    return [a / len(perms) for a in acc]


@settings(max_examples=200)
@given(
    st.integers(1, 4),
    st.dictionaries(st.integers(0, 15), st.integers(0, 9), max_size=8),
)
def test_shapley_lattice_form_equals_permutation_definition(k, raw):
    c = {T & ((1 << k) - 1): cv for T, cv in raw.items()}
    # merge masks that collided after truncation to k bits
    merged: dict[int, int] = {}
    for T, cv in raw.items():
        merged[T & ((1 << k) - 1)] = merged.get(T & ((1 << k) - 1), 0) + cv
    c = merged
    num = _lattice_phi_num(k, c)
    ref = _permutation_phi(k, c)
    fk = math.factorial(k)
    for i in range(k):
        assert Fraction(num[i], fk) == ref[i]


@settings(max_examples=200)
@given(
    st.integers(1, 4),
    st.dictionaries(st.integers(0, 15), st.integers(0, 9), max_size=8),
)
def test_shapley_efficiency_axiom(k, raw):
    """sum_i phi_i == v(full) - v(empty) (times k! in integer form)."""
    c = {}
    for T, cv in raw.items():
        c[T & ((1 << k) - 1)] = c.get(T & ((1 << k) - 1), 0) + cv

    def v(S):
        return sum(cv for T, cv in c.items() if (T & S) == T)

    num = _lattice_phi_num(k, c)
    assert sum(num) == math.factorial(k) * (v((1 << k) - 1) - v(0))


# ---------------------------------------------------------------------
# McNemar: the discordant-cell form is invariant to concordant cells,
# and the continuity clamp never goes negative.
# ---------------------------------------------------------------------

@settings(max_examples=500)
@given(st.integers(0, 1000), st.integers(0, 1000),
       st.integers(0, 10**6), st.integers(0, 10**6))
def test_mcnemar_concordant_invariance_and_clamp(b, c, n11, n00):
    if b + c == 0:
        return
    chi2 = (1000000 * (b - c) * (b - c)) // (b + c)
    cc = max(abs(b - c) - 1, 0)
    chi2_cc = (1000000 * cc * cc) // (b + c)
    # concordant cells never appear: recompute with them zeroed
    assert chi2 == (1000000 * (b - c) * (b - c)) // (b + c)
    assert chi2_cc >= 0
    assert chi2_cc <= chi2 or (b == c)
    # textbook rational vs truncated integer: off by < 1 ulp of e6
    exact = Fraction(1000000 * (b - c) * (b - c), b + c)
    assert 0 <= exact - chi2 < 1


# ---------------------------------------------------------------------
# Mantel-Haenszel: per-stratum truncation error is bounded by 1 ulp per
# stratum, and the pooled OR is Simpson-safe on a constructed family.
# ---------------------------------------------------------------------

_cells = st.tuples(st.integers(0, 500), st.integers(0, 500),
                   st.integers(0, 500), st.integers(0, 500)).filter(
    lambda t: sum(t) > 0
)


@settings(max_examples=300)
@given(st.lists(_cells, min_size=1, max_size=6))
def test_mh_truncated_terms_within_one_ulp_per_stratum(strata):
    r_trunc = sum((1000000 * a * d) // (a + b + c + d) for a, b, c, d in strata)
    s_trunc = sum((1000000 * b * c) // (a + b + c + d) for a, b, c, d in strata)
    r_exact = sum(Fraction(1000000 * a * d, a + b + c + d) for a, b, c, d in strata)
    s_exact = sum(Fraction(1000000 * b * c, a + b + c + d) for a, b, c, d in strata)
    assert 0 <= r_exact - r_trunc < len(strata)
    assert 0 <= s_exact - s_trunc < len(strata)


def test_mh_resists_simpsons_paradox_hand_family():
    """Two strata each with within-stratum OR = 1 but wildly different
    base rates: collapsing the table inverts the signal; MH pools to
    exactly 1e6 (OR = 1)."""
    strata = [(80, 20, 40, 10), (10, 40, 20, 80)]
    r = sum((1000000 * a * d) // (a + b + c + d) for a, b, c, d in strata)
    s = sum((1000000 * b * c) // (a + b + c + d) for a, b, c, d in strata)
    assert (1000000 * r) // s == 1000000
    # collapsed table says otherwise (confounded)
    A = sum(x[0] for x in strata); B = sum(x[1] for x in strata)
    C = sum(x[2] for x in strata); D = sum(x[3] for x in strata)
    assert A * D != B * C


# ---------------------------------------------------------------------
# Brier decomposition: on integer p_e2/y rows the EXACT identity is
# brier == rel - res + unc + wiv - 2*wcov, where wiv is the within-bin
# forecast variance and wcov the within-bin forecast/outcome covariance
# (both vanish when forecasts are constant per bin — the binned
# estimator's whole error term, verified in exact rationals).
# ---------------------------------------------------------------------

_rows = st.lists(
    st.tuples(st.integers(0, 100), st.integers(0, 1)), min_size=1, max_size=60
)


@settings(max_examples=300)
@given(_rows)
def test_brier_murphy_identity_with_within_bin_terms(rows):
    n = len(rows)
    brier = Fraction(sum((p - 100 * y) ** 2 for p, y in rows), 10000 * n)
    bins: dict[int, list[tuple[int, int]]] = {}
    for p, y in rows:
        bins.setdefault(p // 10, []).append((p, y))
    sy = sum(y for _, y in rows)
    ybar = Fraction(sy, n)
    rel = res = wiv = wcov = Fraction(0)
    for rs in bins.values():
        nk = len(rs)
        pbar = Fraction(sum(p for p, _ in rs), 100 * nk)
        ybark = Fraction(sum(y for _, y in rs), nk)
        rel += nk * (pbar - ybark) ** 2
        res += nk * (ybark - ybar) ** 2
        wiv += sum((Fraction(p, 100) - pbar) ** 2 for p, _ in rs)
        wcov += sum(
            (Fraction(p, 100) - pbar) * (y - ybark) for p, y in rs
        )
    unc = ybar * (1 - ybar)
    assert brier == rel / n - res / n + unc + wiv / n - 2 * wcov / n
    # and when every bin's forecast is constant, the plain Murphy
    # identity the engine's hand test uses holds exactly
    if wiv == 0:
        assert wcov == 0
        assert brier == rel / n - res / n + unc


# ---------------------------------------------------------------------
# Quantized OLS (zipf/heaps): the integer-sum slope converges to the
# true slope as quantization vanishes relative to spread.
# ---------------------------------------------------------------------

@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(st.integers(1, 10**6), st.integers(1, 10**6)),
        min_size=3,
        max_size=50,
    )
)
def test_quantized_ols_matches_float_ols_within_quantization(pts):
    q = [(math.floor(1e5 * math.log(x)), math.floor(1e5 * math.log(y))) for x, y in pts]
    n = len(q)
    sx = sum(p[0] for p in q); sy = sum(p[1] for p in q)
    sxy = sum(p[0] * p[1] for p in q); sxx = sum(p[0] * p[0] for p in q)
    den = n * sxx - sx * sx
    if den == 0:
        return
    slope_q = (n * sxy - sx * sy) / den
    # float reference on the UNQUANTIZED lns
    fx = [math.log(x) for x, _ in pts]; fy = [math.log(y) for _, y in pts]
    mfx = sum(fx) / n; mfy = sum(fy) / n
    fden = sum((a - mfx) ** 2 for a in fx)
    if fden < 1e-4:  # spread below quantization resolution: skip
        return
    slope_f = sum((a - mfx) * (b - mfy) for a, b in zip(fx, fy)) / fden
    # e5 quantization on both axes perturbs the slope by O(1e-5 * scale)
    spread = max(fx) - min(fx)
    assert abs(slope_q - slope_f) <= 2e-5 * (1 + abs(slope_f)) * (n / fden + 1 / spread + 1)


# ---------------------------------------------------------------------
# GRPO: within one group the UNFLOORED advantages sum to exactly zero,
# so the engine's floored sum is bounded by the group size.
# ---------------------------------------------------------------------

@settings(max_examples=300)
@given(st.lists(st.integers(-10**4, 10**4), min_size=2, max_size=40))
def test_grpo_group_advantage_floor_sum_bound(rs):
    n = len(rs)
    mean = sum(rs) / n
    var = sum(r * r for r in rs) / n - mean * mean
    if var <= 0:
        return
    advs = [math.floor(1e4 * ((r - mean) / math.sqrt(var))) for r in rs]
    # true advantages sum to ~0; each floor loses < 1
    assert -n <= sum(advs) <= n
