"""Property layer for the round-10 certificates (no Spark session — pure
fold functions and the twin-derivation identities).

Three claims the oracle SQL rewrites rest on, each proven here over
random inputs instead of argued in a docstring:

1. cusum_fold == the closed drawdown form the DuckDB twin evaluates
   (s_n = p_n − min(0, min prefix); negative side via the running max),
   and the fold is BATCHING-INVARIANT (any micro-batch partition of the
   dev sequence folds to the same state as one batch) — the property the
   replay certificate's batch boundaries exercise.
2. change_detect_fold == the lag() reference (emit where |v − prev| >
   threshold over the whole history), batching-invariant.
3. The BPE twin's encoded-replace step == the training loop's skip-2
   greedy re-segmentation (the replace()-is-the-greedy-merge claim in
   _bpe_train_apply_sql's docstring).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from storm_data_etl_spark.streaming.stateful import (
    CHANGE_DETECT_ZERO,
    CUSUM_ZERO,
    DEDUP_ZERO,
    change_detect_fold,
    cusum_fold,
    dedup_fold,
)

devs_st = st.lists(st.integers(-(10**7), 10**7), max_size=60)
# split points: a sorted list of cut indices defining micro-batches
splits_st = st.lists(st.integers(0, 60), max_size=5)


def _batches(xs, cuts):
    cuts = sorted({min(c, len(xs)) for c in cuts})
    out, prev = [], 0
    for c in cuts:
        out.append(xs[prev:c])
        prev = c
    out.append(xs[prev:])
    return out


@settings(max_examples=300)
@given(devs=devs_st, cuts=splits_st)
def test_cusum_fold_equals_drawdown_closed_form(devs, cuts):
    # batched fold (the replay path) == one-shot fold == closed form
    st_batched = CUSUM_ZERO
    for b in _batches(devs, cuts):
        st_batched = cusum_fold(st_batched, b)
    assert st_batched == cusum_fold(CUSUM_ZERO, devs)

    p, minp, maxp = 0, 0, 0
    for d in devs:
        p += d
        minp = min(minp, p)
        maxp = max(maxp, p)
    s_pos = p - min(0, minp)
    s_neg = max(0, maxp) - p
    assert st_batched == (s_pos, s_neg, len(devs))


vals_st = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False), max_size=40
)


@settings(max_examples=300)
@given(vals=vals_st, cuts=splits_st, thr=st.floats(0, 100, allow_nan=False))
def test_change_detect_fold_equals_lag_reference(vals, cuts, thr):
    last, emits = CHANGE_DETECT_ZERO, []
    for b in _batches(vals, cuts):
        last, e = change_detect_fold(last, b, thr)
        emits.extend(e)
    ref = [
        (vals[i - 1], vals[i], vals[i] - vals[i - 1])
        for i in range(1, len(vals))
        if abs(vals[i] - vals[i - 1]) > thr
    ]
    assert emits == ref
    assert last == (vals[-1] if vals else None)


@settings(max_examples=300)
@given(sizes=st.lists(st.integers(0, 5), max_size=8))
def test_dedup_fold_emits_exactly_first_nonempty_batch(sizes):
    state, emit_at = DEDUP_ZERO, None
    for i, n in enumerate(sizes):
        state, emit = dedup_fold(state, n)
        if emit:
            assert emit_at is None, "second emit for one key"
            emit_at = i
    assert state == (sum(sizes),)
    nonempty = [i for i, n in enumerate(sizes) if n > 0]
    assert emit_at == (nonempty[0] if nonempty else None)


# --- BPE twin-derivation identity -----------------------------------------

sym_st = st.text(alphabet="ab", min_size=1, max_size=3)


@settings(max_examples=300)
@given(
    word=st.lists(sym_st, min_size=0, max_size=12),
    a=sym_st,
    b=sym_st,
)
def test_replace_equals_skip2_greedy_merge(word, a, b):
    """train_bpe_merges re-segments with a left-to-right skip-2 loop; the
    DuckDB twin does it with string replace() over single-char-encoded
    symbols. Equal because a merged symbol ab can never equal a (|ab| >
    |a|), so no cascade forms — checked here over random symbol words
    including the overlapping a == b case."""
    # the kernel's loop (operators/bpe.py train_bpe_merges, verbatim shape)
    out, i, ab = [], 0, a + b
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(word[i])
            i += 1

    # the twin's encoded-replace step: every DISTINCT symbol one char
    alphabet = sorted(set(word) | {a, b, ab})
    enc = {s: chr(0xE000 + i) for i, s in enumerate(alphabet)}
    dec = {c: s for s, c in enc.items()}
    s = "".join(enc[x] for x in word)
    merged = s.replace(enc[a] + enc[b], enc[ab])
    assert [dec[c] for c in merged] == out
