"""Unit tests for the hybrid-retrieval / curation family
(plans/retrieval_queries.py): RRF fusion arithmetic and ordering,
blocklist hit accounting on a handcrafted corpus, quality-model feature
math vs a pure-Python replica, and URL canonicalization collisions.
Cross-engine value parity runs via tools/pandas_parity_check.py and the
driver's gate."""

from __future__ import annotations

import math

from storm_data_etl_spark.plans import retrieval_queries as RQ


def _patch_docs(
    monkeypatch, spark, rows, cols=("doc_id", "text", "lang", "source", "n_chars")
):
    """Point RQ.t at a handcrafted documents table for this test only —
    monkeypatch restores automatically (parallel-safe, no try/finally)."""
    df = spark.createDataFrame(rows, list(cols))
    monkeypatch.setattr(RQ, "t", lambda spark_, sf_dir_, name: df)


def test_rrf_fusion_arithmetic_and_ordering(spark, sf_dir):
    out = RQ.rrf_hybrid_search(spark, sf_dir).collect()
    assert len(out) == 10
    prev = None
    for r in out:
        assert r["lex_rank"] is not None or r["vec_rank"] is not None
        rrf = 0.0
        if r["lex_rank"] is not None:
            assert 1 <= r["lex_rank"] <= RQ._RRF_LEG_DEPTH
            rrf += 1.0 / (RQ._RRF_K + r["lex_rank"])
        if r["vec_rank"] is not None:
            assert 1 <= r["vec_rank"] <= RQ._RRF_LEG_DEPTH
            rrf += 1.0 / (RQ._RRF_K + r["vec_rank"])
        assert r["rrf_e9"] == math.floor(rrf * 1e9)
        if prev is not None:
            assert r["rrf_e9"] <= prev  # emitted in fused-score order
        prev = r["rrf_e9"]
    # The probe vector itself must never appear as its own neighbor.
    assert all(r["doc_id"] != RQ._RRF_PROBE_ID or r["vec_rank"] is None for r in out)


def test_rrf_both_legs_beat_single_leg(spark, sf_dir):
    """A doc ranked #1 in one leg and present in the other must outscore a
    doc with ONLY a #1 ranking in one leg — the defining RRF property."""
    out = RQ.rrf_hybrid_search(spark, sf_dir).collect()
    both = [r for r in out if r["lex_rank"] is not None and r["vec_rank"] is not None]
    if both:  # fixture-dependent; when overlap exists, fusion must reward it
        best_both = max(
            1.0 / (RQ._RRF_K + r["lex_rank"]) + 1.0 / (RQ._RRF_K + r["vec_rank"])
            for r in both
        )
        assert best_both > 1.0 / (RQ._RRF_K + 1)


def test_blocklist_counts_handcrafted(spark, monkeypatch):
    rows = [
        (1, "slow fail drop", "en", "s1", 14),          # 3 hits / 3 words → dropped
        (2, "fast path no hits here ok fine yes", "en", "s1", 30),
        (3, "drop " + "pad " * 199, "en", "s2", 800),   # 1 hit / 200 words → kept
        (4, "", "en", "s2", 0),                          # empty: no words, no hits
    ]
    _patch_docs(monkeypatch, spark, rows)
    got = {r["source"]: r for r in RQ.blocklist_filter_stats(spark, "x").collect()}
    s1, s2 = got["s1"], got["s2"]
    assert (s1["n_docs"], s1["n_flagged"], s1["total_hits"], s1["max_hits"]) == (2, 1, 3, 3)
    assert s1["n_dropped"] == 1
    assert (s2["n_docs"], s2["n_flagged"], s2["total_hits"]) == (2, 1, 1)
    # doc 3: 1 hit in 200 words → 1·100 < 200 → below the ≥1/100 density
    # threshold → kept; doc 4 has no words → kept.
    assert s2["n_dropped"] == 0


def test_quality_model_matches_python(spark, monkeypatch):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog 42", "en", "s1", 47),
        (2, "a a a a a", "en", "s1", 9),
        (3, "", "en", "s2", 0),
    ]
    _patch_docs(monkeypatch, spark, rows)
    got = {r["source"]: r for r in RQ.quality_model_score(spark, "x").collect()}

    def logit(text):
        toks = [w for w in text.strip().split() if w]
        n = len(toks)
        w = RQ._QW
        sat = n / (n + 50)
        mwl = (sum(len(x) for x in toks) / n) if n else 0.0
        uniq = (len(set(toks)) / n) if n else 0.0
        stop = (sum(1 for x in toks if x in RQ._QSTOP) / n) if n else 0.0
        nc = len(text)
        dig = (sum(c.isdigit() for c in text) / nc) if nc else 0.0
        return w[0] + w[1] * sat + w[2] * mwl + w[3] * uniq + w[4] * stop + w[5] * dig

    l1, l2, l3 = (logit(r[1]) for r in rows)
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["n_keep"] == sum(1 for v in (l1, l2) if v > 0)
    assert got["s1"]["sum_logit_e6"] == math.floor(l1 * 1e6) + math.floor(l2 * 1e6)
    assert got["s2"]["sum_logit_e6"] == math.floor(l3 * 1e6)


def test_url_canonical_collisions(spark, sf_dir):
    out = RQ.url_canonical_dedup(spark, sf_dir).collect()
    assert {r["host"] for r in out} <= {f"cdn{i}.example.org" for i in range(5)}
    n_docs = sum(r["n_urls"] for r in out)
    assert n_docs > 0
    for r in out:
        # canonicalization can only merge, never invent
        assert 0 < r["n_canonical"] <= r["n_urls"]
        assert r["n_dupes"] == r["n_urls"] - r["n_canonical"]
    # Synthetic URLs repeat with period 5·250·7 = 8750 in doc_id (host %5,
    # path %250, rev %7): by pigeonhole a corpus larger than that MUST
    # contain real canonical collisions. Smaller fixtures (sf0.001 has 500
    # docs) exercise only the consistency invariants above; the handcrafted
    # pair test below pins the merge behavior itself.
    if n_docs > 5 * 250 * 7:
        assert sum(r["n_dupes"] for r in out) > 0


def test_url_canonical_merges_known_pair(spark, monkeypatch):
    # doc_id 0 and 3500 agree mod 5 (host), mod 250 (path), mod 7 (rev),
    # and differ in case/port/utm/fragment noise → must canonicalize equal.
    rows = [(0, "x", "en", "s", 1), (3500, "x", "en", "s", 1)]
    _patch_docs(monkeypatch, spark, rows)
    out = RQ.url_canonical_dedup(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_urls"], r["n_canonical"], r["n_dupes"]) == (2, 1, 1)
