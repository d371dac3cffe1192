"""Property tests for the round-8 integer-exact statistic DERIVATIONS:
each engine formula (re-evaluated here in pure Python ints, the same
expression the SQL/Spark pair computes) must equal the textbook float
definition of the statistic to within its declared truncation.

The oracle gate proves Spark ≡ DuckDB; these prove the shared formula ≡
the statistic — the two can agree on a wrong derivation, which no amount
of cross-engine hashing would catch. Pure Python, no Spark session.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

SETTINGS = settings(max_examples=300, deadline=None)

labels = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2)), min_size=1, max_size=60
)
labels3 = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 2)),
    min_size=1,
    max_size=60,
)


def _tdiv(num: int, den: int) -> int:
    """Sign-symmetric truncating division (Spark div ≡ DuckDB // for the
    spelled-out-sign form every negative-capable query uses)."""
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


@given(labels)
@SETTINGS
def test_krippendorff_interval_formula(rows):
    n = len(rows)
    sd = sum((a - b) * (a - b) for a, b in rows)
    c = [0, 0, 0]
    for a, b in rows:
        c[a] += 1
        c[b] += 1
    se = 2 * (c[0] * c[1] + c[1] * c[2] + 4 * c[0] * c[2])
    if se == 0:
        return  # NULL branch: all pooled labels identical
    alpha_e6 = _tdiv(1000000 * (se - 2 * sd * (2 * n - 1)), se)
    # textbook: α = 1 − D_o/D_e, D_o = sd/n, D_e = S_e/(N(N−1)), N = 2n
    d_o = sd / n
    d_e = se / (2 * n * (2 * n - 1))
    alpha = 1.0 - d_o / d_e
    assert abs(alpha_e6 / 1e6 - alpha) <= 1e-6 + 1e-9


@given(labels)
@SETTINGS
def test_mcc_formula(rows):
    tp = sum(1 for a, b in rows if a >= 1 and b >= 1)
    fp = sum(1 for a, b in rows if a == 0 and b >= 1)
    fn = sum(1 for a, b in rows if a >= 1 and b == 0)
    tn = sum(1 for a, b in rows if a == 0 and b == 0)
    if 0 in (tp + fp, tp + fn, tn + fp, tn + fn):
        return  # NULL branch
    mcc_e6 = math.floor(
        1000000.0
        * float(tp * tn - fp * fn)
        / math.sqrt(float((tp + fp) * (tp + fn)) * float((tn + fp) * (tn + fn)))
    )
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(mcc_e6 / 1e6 - mcc) <= 1e-6 + 1e-9
    assert -1_000_000 <= mcc_e6 <= 1_000_000


@given(labels3)
@SETTINGS
def test_cochran_q_formula(rows):
    b = [(int(a >= 1), int(c >= 1), int(d >= 1)) for a, c, d in rows]
    cj = [sum(r[j] for r in b) for j in range(3)]
    nn = sum(cj)
    sr2 = sum(sum(r) ** 2 for r in b)
    den = 3 * nn - sr2
    if den == 0:
        return  # NULL: every row unanimous
    q_e6 = (1000000 * (2 * (3 * sum(x * x for x in cj) - nn * nn))) // den
    # textbook Cochran's Q, k = 3
    k = 3
    q = (k - 1) * (k * sum(x * x for x in cj) - nn * nn) / (k * nn - sr2)
    assert q >= 0
    assert abs(q_e6 / 1e6 - q) <= 1e-6 + 1e-9


@given(labels3)
@SETTINGS
def test_cronbach_alpha_formula(rows):
    n = len(rows)
    cols = list(zip(*rows))
    sv = sum(
        n * sum(x * x for x in col) - sum(col) ** 2 for col in cols
    )
    tot = [sum(r) for r in rows]
    st_ = n * sum(x * x for x in tot) - sum(tot) ** 2
    if st_ == 0:
        return  # NULL: total score constant
    alpha_e6 = _tdiv(1000000 * 3 * (st_ - sv), 2 * st_)
    # textbook: α = k/(k−1)·(1 − ΣV_j/V_T) — the n(n−1) denominators
    # cancel, so sample vs population variance is immaterial.
    alpha = 1.5 * (1.0 - sv / st_)
    assert abs(alpha_e6 / 1e6 - alpha) <= 1e-6 + 1e-9


@given(st.lists(st.integers(1, 8), min_size=1, max_size=40))
@SETTINGS
def test_simpson_and_gini_formulas(counts):
    """counts = token-type frequencies of one source."""
    n = sum(counts)
    v = len(counts)
    # Simpson λ (no-replacement collision probability)
    s2 = sum(c * (c - 1) for c in counts)
    if n >= 2:
        lam_e6 = (1000000 * s2) // (n * (n - 1))
        pairs_same = sum(c * (c - 1) for c in counts)
        lam = pairs_same / (n * (n - 1))
        assert abs(lam_e6 / 1e6 - lam) <= 1e-6 + 1e-9
    # Gini via the ascending-rank identity
    asc = sorted(counts)
    s = sum((i + 1) * c for i, c in enumerate(asc))
    gini_e6 = (1000000 * (2 * s - (v + 1) * n)) // (v * n)
    # textbook: mean absolute difference / (2·mean)
    mad = sum(abs(a - b) for a in counts for b in counts) / (v * v)
    gini = mad / (2 * (n / v))
    assert 2 * s - (v + 1) * n >= 0  # Chebyshev sum inequality
    assert abs(gini_e6 / 1e6 - gini) <= 1e-6 + 1e-9


@given(
    st.lists(
        st.lists(st.booleans(), min_size=1, max_size=15), min_size=1, max_size=8
    )
)
@SETTINGS
def test_mrr_map_formulas(queries):
    """queries = per-query relevance lists in rank order (True = relevant)."""
    # MRR@10: 1/r carried as 2520/r; no-hit queries contribute 0.
    s2520 = 0
    for rels in queries:
        fr = next((i + 1 for i, r in enumerate(rels[:10]) if r), None)
        if fr is not None:
            s2520 += 2520 // fr
    mrr_e6 = (1000000 * s2520) // (2520 * len(queries))
    mrr = sum(
        1.0 / next((i + 1 for i, r in enumerate(rels[:10]) if r), math.inf)
        for rels in queries
    ) / len(queries)
    assert abs(mrr_e6 / 1e6 - mrr) <= 1e-6 + 1e-9
    # MAP@10: AP·2520² stays integer because R ≤ 10 divides 2520.
    s_ap = 0
    n_eval = 0
    for rels in queries:
        r_tot = min(sum(rels), 10)
        if r_tot == 0:
            continue
        n_eval += 1
        hits = 0
        apnum = 0
        for i, rel in enumerate(rels[:10], start=1):
            if rel:
                hits += 1
                apnum += hits * (2520 // i)
        s_ap += apnum * (2520 // r_tot)
    if n_eval == 0:
        return  # NULL branch
    map_e6 = (1000000 * s_ap) // (6350400 * n_eval)
    aps = []
    for rels in queries:
        r_tot = min(sum(rels), 10)
        if r_tot == 0:
            continue
        hits = 0
        ap = 0.0
        for i, rel in enumerate(rels[:10], start=1):
            if rel:
                hits += 1
                ap += hits / i
        aps.append(ap / r_tot)
    assert abs(map_e6 / 1e6 - sum(aps) / len(aps)) <= 1e-6 + 1e-9


@given(st.lists(st.booleans(), min_size=2, max_size=80))
@SETTINGS
def test_runs_test_formula(signs):
    n = len(signs)
    n1 = sum(signs)
    n0 = n - n1
    if n0 == 0 or n1 == 0 or 2 * n0 * n1 <= n:
        return  # NULL branch
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 2.0 * n0 * n1 / n + 1.0
    var = 2.0 * n0 * n1 * (2.0 * n0 * n1 - n) / (n * n * (n - 1.0))
    z_e6 = math.floor(1000000.0 * (r - mu) / math.sqrt(var))
    # textbook Wald–Wolfowitz normal approximation — same μ/σ, so this
    # checks the run COUNTING identity (lag-based r_start sum ≡ 1+breaks)
    assert abs(z_e6 / 1e6 - (r - mu) / math.sqrt(var)) <= 1e-6 + 1e-9


# ---------------------------------------------------------------------
# Round-7/8 algebraic identities: reductions whose correctness is not
# obvious from the SQL — proven here against the definitional form.
# ---------------------------------------------------------------------


@given(labels3)
@SETTINGS
def test_fleiss_m3_reduction(rows):
    """The m = 3 shortcut Σ_j n_ij² = m + 2·(agreeing pairs) and the
    resulting κ = (3n·P − Σc²)/(9n² − Σc²) must equal textbook Fleiss
    (P̄, P̄_e over the per-item category multiplicities)."""
    n = len(rows)
    pairs = sum(
        (a == b) + (a == c) + (b == c) for a, b, c in rows
    )
    cs = [0, 0, 0]
    for a, b, c in rows:
        cs[a] += 1
        cs[b] += 1
        cs[c] += 1
    csq = sum(x * x for x in cs)
    den = 9 * n * n - csq
    if den == 0:
        return  # NULL branch
    kappa_e6 = _tdiv(1000000 * (3 * n * pairs - csq), den)
    # textbook Fleiss 1971, m = 3: P_i = (Σ_j n_ij² − m)/(m(m−1))
    m = 3
    p_is = []
    for a, b, c in rows:
        nij = [0, 0, 0]
        for lbl in (a, b, c):
            nij[lbl] += 1
        p_is.append((sum(x * x for x in nij) - m) / (m * (m - 1)))
    p_bar = sum(p_is) / n
    p_j = [x / (n * m) for x in cs]
    p_e = sum(p * p for p in p_j)
    kappa = (p_bar - p_e) / (1.0 - p_e)
    assert abs(kappa_e6 / 1e6 - kappa) <= 1e-6 + 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 9999), st.booleans()),
        min_size=1,
        max_size=80,
    )
)
@SETTINGS
def test_ece_telescope(scored):
    """ECE·1e6 = (100·Σ_b |1e4·Σlabel_b − Σscore_b|) tdiv N must equal
    the definitional Σ_b (n_b/N)·|acc_b − conf_b| — the identity is that
    the n_b denominators inside acc/conf cancel against the weight."""
    bins: dict[int, list[tuple[int, bool]]] = {}
    for s_e4, y in scored:
        bins.setdefault(min(9, s_e4 // 1000), []).append((s_e4, y))
    n = len(scored)
    t_abs = sum(
        abs(10000 * sum(y for _, y in rows_) - sum(s for s, _ in rows_))
        for rows_ in bins.values()
    )
    ece_e6 = (100 * t_abs) // n
    ece = sum(
        (len(rows_) / n)
        * abs(
            sum(y for _, y in rows_) / len(rows_)
            - sum(s for s, _ in rows_) / len(rows_) / 10000.0
        )
        for rows_ in bins.values()
    )
    assert abs(ece_e6 / 1e6 - ece) <= 1e-6 + 1e-9


@given(
    st.dictionaries(
        st.integers(0, 12),  # token ids
        st.tuples(st.integers(0, 6), st.integers(0, 6)),  # (source count, other count)
        min_size=1,
        max_size=13,
    )
)
@SETTINGS
def test_tv_missing_mass_telescope(vocab):
    """TV·1e6 = (1e6·(T_in + N_s·(N − G_seen))) tdiv (2·N_s·N) — the
    missing-mass split (join only the source's own vocab; absent tokens
    telescope) must equal the definitional ½·Σ|p_i − q_i| over the FULL
    global vocabulary."""
    # global counts g_i = source + other; source counts c_i
    g = {t: sc + oc for t, (sc, oc) in vocab.items() if sc + oc > 0}
    c = {t: sc for t, (sc, _) in vocab.items() if sc > 0}
    n = sum(g.values())
    n_s = sum(c.values())
    if n_s == 0 or n == 0:
        return  # source absent from the corpus
    t_in = sum(abs(c[t] * n - g[t] * n_s) for t in c)
    g_seen = sum(g[t] for t in c)
    tv_e6 = (1000000 * (t_in + n_s * (n - g_seen))) // (2 * n_s * n)
    tv = 0.5 * sum(
        abs(c.get(t, 0) / n_s - g[t] / n) for t in g
    )
    assert abs(tv_e6 / 1e6 - tv) <= 1e-6 + 1e-9
