"""Property layer for the round-9 CONTINUATION integer-exact derivations
(extends tests/test_property_round9.py): pure-Python hypothesis checks
that the cross-multiplied / rank-sum / order-statistic integer forms used
by effect_size_panel, best_of_n_reward_curve, t_closeness_audit,
jarque_bera_normality, cuped_adjusted_lift and xcorr_lead_lag equal the
textbook rational definitions EXACTLY (Fraction arithmetic, no floats).
No Spark session — these pin the arithmetic identities both engines
evaluate, at thousands of random points."""

from __future__ import annotations

import itertools
from collections import Counter
from fractions import Fraction

from hypothesis import given, settings, strategies as st

_vals = st.lists(st.integers(0, 12), min_size=1, max_size=12)


def _rank_sums(a: list[int], b: list[int]) -> tuple[int, int]:
    """The per-value tie-group scan both engines run: doubled midrank sums
    2R per arm, from (a_cnt, b_cnt, t, below) rows."""
    per_v = sorted(Counter([*a, *b]).items())
    below = 0
    r2a = r2b = 0
    av, bv = Counter(a), Counter(b)
    for v, t in per_v:
        r2a += av[v] * (2 * below + t + 1)
        r2b += bv[v] * (2 * below + t + 1)
        below += t
    return r2a, r2b


@settings(max_examples=300)
@given(_vals, _vals)
def test_cliffs_delta_rank_form_equals_pair_census(a, b):
    """(2U_a - 2U_b) / (2 n1 n2) == (#[a>b] - #[a<b]) / (n1 n2) exactly:
    the half-tie midrank terms cancel in the difference."""
    r2a, r2b = _rank_sums(a, b)
    n1, n2 = len(a), len(b)
    u2a = r2a - n1 * (n1 + 1)
    u2b = r2b - n2 * (n2 + 1)
    census = sum(
        (1 if x > y else -1 if x < y else 0) for x in a for y in b
    )
    assert Fraction(u2a - u2b, 2 * n1 * n2) == Fraction(census, n1 * n2)


@settings(max_examples=200)
@given(st.lists(st.integers(0, 6), min_size=1, max_size=5),
       st.sampled_from([1, 2, 3, 4, 8]))
def test_best_of_n_cdf_form_equals_exhaustive_enumeration(rewards, n):
    """sum_r r * (cle^n - clt^n) / N^n == the exact mean of max() over
    ALL N^n ordered draws (with replacement) — the CDF telescoping is the
    whole estimator, so enumerate it."""
    if len(rewards) ** n > 200_000:  # keep the exhaustive side tractable
        n = 2
    N = len(rewards)
    per_v = sorted(Counter(rewards).items())
    cle = 0
    num = 0
    for v, cnt in per_v:
        clt = cle
        cle += cnt
        num += v * (cle**n - clt**n)
    closed = Fraction(num, N**n)
    brute = Fraction(
        sum(max(t) for t in itertools.product(rewards, repeat=n)), N**n
    )
    assert closed == brute


@settings(max_examples=300)
@given(st.lists(st.integers(0, 9), min_size=1, max_size=10),
       st.lists(st.integers(0, 9), min_size=1, max_size=10))
def test_t_closeness_cross_multiplied_emd(class_hours, other_hours):
    """|cum_g*N - cum_all*n_g| summed, over n_g*N*(m-1), equals the
    textbook ordered EMD sum|cumP - cumQ|/(m-1) in exact rationals."""
    all_hours = class_hours + other_hours
    domain = sorted(set(all_hours))
    m = len(domain)
    if m < 2:
        return
    n_g, N = len(class_hours), len(all_hours)
    cg, ca = Counter(class_hours), Counter(all_hours)
    cum_g = cum_all = steps = 0
    emd = Fraction(0)
    run_p = run_q = Fraction(0)
    for h in domain:
        cum_g += cg[h]
        cum_all += ca[h]
        steps += abs(cum_g * N - cum_all * n_g)
        run_p += Fraction(cg[h], n_g)
        run_q += Fraction(ca[h], N)
        emd += abs(run_p - run_q)
    assert Fraction(steps, n_g * N * (m - 1)) == emd / (m - 1)


@settings(max_examples=300)
@given(st.lists(st.integers(-20, 20), min_size=2, max_size=15))
def test_jarque_bera_raw_moment_expansion(vs):
    """The raw-moment expansions the engines evaluate equal the direct
    central moments sum((v-mean)^k)/n for k = 2, 3, 4 — in exact
    rationals (the engine then evaluates the same algebra in IEEE)."""
    n = len(vs)
    s1, s2 = sum(vs), sum(v * v for v in vs)
    s3, s4 = sum(v**3 for v in vs), sum(v**4 for v in vs)
    md = Fraction(s1, n)
    r2, r3, r4 = Fraction(s2, n), Fraction(s3, n), Fraction(s4, n)
    m2 = r2 - md * md
    m3 = r3 - 3 * md * r2 + 2 * md**3
    m4 = r4 - 4 * md * r3 + 6 * md * md * r2 - 3 * md**4
    assert m2 == sum(Fraction((v - md) ** 2) for v in vs) / n
    assert m3 == sum(Fraction((v - md) ** 3) for v in vs) / n
    assert m4 == sum(Fraction((v - md) ** 4) for v in vs) / n


@settings(max_examples=300)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=2, max_size=12))
def test_cuped_cleared_denominator_theta(pairs):
    """(n*sxy - sx*sy) / (n*sxx - sx^2) == cov(x,y)/var(x) with the
    population (1/n) convention, exactly — the cleared-denominator form
    both engines evaluate."""
    n = len(pairs)
    xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in pairs)
    varn = n * sxx - sx * sx
    if varn == 0:
        return
    xbar, ybar = Fraction(sx, n), Fraction(sy, n)
    cov = sum((x - xbar) * (y - ybar) for x, y in pairs) / n
    var = sum((x - xbar) ** 2 for x in xs) / n
    assert Fraction(n * sxy - sx * sy, varn) == cov / var


@settings(max_examples=300)
@given(st.lists(st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
                min_size=2, max_size=12))
def test_pearson_cleared_denominator_squared(pairs):
    """(n*sxy - sx*sy)^2 / ((n*sxx - sx^2)(n*syy - sy^2)) == r^2 by the
    textbook mean-centered definition — pins xcorr_lead_lag's numerator/
    denominator algebra (the engines take one sqrt at the very end)."""
    n = len(pairs)
    xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
    sx, sy = sum(xs), sum(ys)
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    sxy = sum(x * y for x, y in pairs)
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx == 0 or dy == 0:
        return
    xbar, ybar = Fraction(sx, n), Fraction(sy, n)
    num = sum((x - xbar) * (y - ybar) for x, y in pairs)
    den_x = sum((x - xbar) ** 2 for x in xs)
    den_y = sum((y - ybar) ** 2 for y in ys)
    assert Fraction(n * sxy - sx * sy, 1) ** 2 * den_x * den_y == Fraction(
        num, 1
    ) ** 2 * dx * dy


@settings(max_examples=300)
@given(st.lists(st.integers(0, 10), min_size=1, max_size=20))
def test_km_no_censoring_equals_empirical_survival(durs):
    """With zero censoring, the Kaplan-Meier product-limit at each death
    time t equals the plain empirical survival fraction #{dur > t}/N —
    the estimator's defining fixed point (Kaplan & Meier 1958 reduce to
    the ECDF complement exactly when every subject dies)."""
    N = len(durs)
    per_t = sorted(Counter(durs).items())
    # suffix risk sets
    at_risk = N
    s = Fraction(1)
    for t, d in per_t:
        s *= 1 - Fraction(d, at_risk)
        expected = Fraction(sum(1 for x in durs if x > t), N)
        assert s == expected
        at_risk -= d


@settings(max_examples=300)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=25))
def test_lower_median_rank_selection(vs):
    """The (n+1) div 2 cumulative-rank selection levene_brown_forsythe
    runs equals statistics.median_low — the convention both engines must
    share (the even-n case is where double division broke it)."""
    import statistics

    target = (len(vs) + 1) // 2
    per_v = sorted(Counter(vs).items())
    c = 0
    got = None
    for v, cnt in per_v:
        c += cnt
        if c >= target:
            got = v
            break
    assert got == statistics.median_low(vs)
