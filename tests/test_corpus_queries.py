"""Unit tests for the corpus-quality family (plans/corpus_queries.py):
markup stripping semantics, EWMA fold vs a Python model, change-point
flags, and bigram LM sanity (duplicated docs score higher than unique
text). The full value-parity check against DuckDB runs via
tools/oracle_check.py / the driver's harness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.plans import corpus_queries as CQ


def test_strip_markup(spark):
    rows = [
        ("<p>hello <b>world</b></p>",),
        ("a &nbsp; b &#39;c",),
        ("   plain   text ",),
        ("<a href='x'>link</a>tail",),
    ]
    df = spark.createDataFrame(rows, ["html"])
    got = [r[0] for r in df.select(X.strip_markup("html")).collect()]
    assert got == ["hello world", "a b c", "plain text", "link tail"]


def test_ewma_matches_python_model(spark, sf_dir):
    out = {r["user_id"]: r for r in CQ.ewma_last(spark, sf_dir).collect()}
    # Python model: fold the last ≤20 values per user in (ts, event_id) order.
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [r["value"] for r in rows][-20:]
        s = vals[0]
        for x in vals[1:]:
            s = s * 0.8 + x * 0.2
        assert out[uid]["n_window"] == len(vals)
        assert out[uid]["ewma_e4"] == math.floor(10000 * s)


def test_change_points_flag_large_jumps(spark):
    rows = [
        (1, 10, 100, 5.0),
        (1, 20, 101, 6.0),
        (1, 30, 102, 300.0),  # +294 → change point
        (2, 10, 200, 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    orig = CQ.t
    CQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        got = {r["user_id"]: r for r in CQ.value_change_points(spark, "x").collect()}
    finally:
        CQ.t = orig
    assert got[1]["n_events"] == 3
    assert got[1]["n_steps"] == 2
    assert got[1]["n_change_points"] == 1
    assert got[1]["max_jump_e2"] == 29400
    assert got[2]["n_steps"] == 0
    assert got[2]["max_jump_e2"] is None


def test_bigram_lm_prefers_repeated_text(spark, sf_dir):
    """A document made of the corpus's most common bigrams must outscore a
    document of singleton bigrams — directional sanity of the LM."""
    scores = CQ.bigram_lm_score(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    joined = scores.join(docs, "doc_id").select("doc_id", "lm_score_e4", "text")
    stats = joined.agg(
        F.min("lm_score_e4").alias("lo"), F.max("lm_score_e4").alias("hi")
    ).first()
    # Scores are mean log-probs: strictly negative, and not all equal.
    assert stats["hi"] < 0
    assert stats["lo"] < stats["hi"]


def test_hll_rollup_estimate_close_to_exact(spark, sf_dir):
    """Merged daily HLL sketches estimate per-type distinct users within
    2% of the exact count (lgK=12 on small cardinalities is near-exact)."""
    from pyspark.sql import functions as F
    from storm_data_etl_spark.plans.window_queries import hll_distinct_rollup

    est = {
        r.event_type: r.distinct_users_est
        for r in hll_distinct_rollup(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for etype, n in exact.items():
        assert abs(est[etype] - n) <= max(1, 0.02 * n), (etype, est[etype], n)


def test_doc_repetition_stats_known_doc(spark):
    rows = [
        (1, "the cat sat the cat sat on mat"),
        (2, "x"),
        (3, ""),
        (4, "  spaced   out  "),  # run-of-spaces tokenization
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    orig = CQ.t
    CQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        got = {r["doc_id"]: r for r in CQ.doc_repetition_stats(spark, "x").collect()}
    finally:
        CQ.t = orig
    r1 = got[1]
    assert (r1["n_words"], r1["distinct_words"], r1["top_word_count"]) == (8, 5, 2)
    assert r1["top_bigram_count"] == 2  # "the cat" / "cat sat"
    assert r1["dup_trigram_tokens"] == 2  # "the cat sat" twice
    assert (got[2]["n_words"], got[2]["top_bigram_count"], got[2]["dup_trigram_tokens"]) == (1, 0, 0)
    assert tuple(got[3][c] for c in ("n_words", "distinct_words", "top_word_count",
                                     "top_bigram_count", "dup_trigram_tokens")) == (0, 0, 0, 0, 0)
    assert (got[4]["n_words"], got[4]["distinct_words"]) == (2, 2)


def test_holt_trend_forecast_matches_python_fold(spark, sf_dir):
    """The Holt state must equal a pure-Python left fold over the same
    trailing-64 ordered values (identical op order → exact equality)."""
    import math

    out = {r["event_type"]: r for r in CQ.holt_trend_forecast(spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for et, rows in by_type.items():
        rows.sort()
        vals = [v for _, _, v in rows][-64:]
        l, b = float(vals[0]), 0.0
        for v in vals[1:]:
            nl = 0.2 * v + 0.8 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            l = nl
        r = out[et]
        assert r["n_window"] == len(vals)
        assert r["level_e4"] == math.floor(10000 * l)
        assert r["trend_e4"] == math.floor(10000 * b)
        assert r["forecast3_e4"] == math.floor(10000 * (l + 3 * b))


def test_text_cluster_sizes_deterministic_and_total(spark, sf_dir):
    a = CQ.text_cluster_sizes(spark, sf_dir).collect()
    b = CQ.text_cluster_sizes(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in a) == n_docs  # every doc assigned once
    assert 1 <= len(a) <= 8


def test_phrase_search_agrees_with_naive_contains(spark, sf_dir):
    """The positional-index method must find exactly the docs a naive
    substring scan finds (token-boundary-safe: pad the text with spaces)."""
    got = {r.doc_id: r for r in CQ.phrase_search_positional(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    phrase = " ".join(CQ._PHRASE)
    naive = {}
    for d in docs:
        toks = [w for w in (d.text or "").split(" ") if w]
        n = sum(
            1
            for i in range(len(toks) - 2)
            if tuple(toks[i : i + 3]) == CQ._PHRASE
        )
        if n:
            naive[d.doc_id] = n
        # sanity that the phrase really appears as a substring too
        if n:
            assert phrase in " ".join(toks)
    assert {k: v.n_occurrences for k, v in got.items()} == naive

    # the sf0.001 fixture may not contain the phrase at all — exercise the
    # positive path on a handcrafted corpus regardless of fixture content
    hand = spark.createDataFrame(
        [
            (1, "x slow hash batch y slow hash batch"),  # two occurrences
            (2, "slow hash batch"),                      # at the very start
            (3, "slow hash other batch"),                # near miss
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    orig = CQ.t
    CQ.t = lambda spark_, sf_dir_, name: hand  # noqa: ARG005
    try:
        hits = {r.doc_id: r for r in CQ.phrase_search_positional(spark, "x").collect()}
    finally:
        CQ.t = orig
    assert hits[1].n_occurrences == 2 and hits[1].first_pos == 2
    assert hits[2].n_occurrences == 1 and hits[2].first_pos == 1
    assert 3 not in hits and 4 not in hits


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dsir_prefers_target_like_docs(spark, monkeypatch):
    """The defining DSIR property: a doc written in the target (en)
    vocabulary must outscore a doc written in the non-target vocabulary,
    because its tokens are relatively more frequent under p_target than
    under p_raw."""
    rows = [
        (1, "the cat sat on the mat", "en", "s", 22),
        (2, "the dog ran to the park", "en", "s", 23),
        (3, "der hund lief zum park", "de", "s", 22),
        (4, "the cat ran to the mat", "de", "s", 22),  # en-vocab, labeled de
    ]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = {r["doc_id"]: r for r in CQ.dsir_importance_weights(spark, "x").collect()}
    assert set(got) == {1, 2, 3, 4}
    # en-vocab docs (1, 2, 4) all beat the pure-de doc 3 — including doc 4,
    # whose LABEL is de but whose tokens are target-like (DSIR scores
    # content, not labels).
    assert min(got[1]["dsir_e4"], got[2]["dsir_e4"], got[4]["dsir_e4"]) > got[3]["dsir_e4"]
    assert got[1]["n_tokens"] == 6


def test_dsir_matches_python_model(spark, monkeypatch):
    import math as _math

    rows = [
        (1, "a b a", "en", "s", 5),
        (2, "b c", "de", "s", 3),
    ]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = {r["doc_id"]: r for r in CQ.dsir_importance_weights(spark, "x").collect()}

    toks = {1: ["a", "b", "a"], 2: ["b", "c"]}
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    for d, ws in toks.items():
        for w in ws:
            raw[w] = raw.get(w, 0) + 1
            if d == 1:  # lang == en
                tgt[w] = tgt.get(w, 0) + 1
    nr, nt, v = sum(raw.values()), sum(tgt.values()), len(raw)
    for d, ws in toks.items():
        s = sum(
            _math.log((tgt.get(w, 0) + 1) / (nt + v))
            - _math.log((raw[w] + 1) / (nr + v))
            for w in ws
        )
        assert got[d]["dsir_e4"] == _math.floor(10000 * s / len(ws))
        assert got[d]["n_tokens"] == len(ws)


def test_ngram_novelty_handcrafted(spark, monkeypatch):
    rows = [
        (1, "alpha beta gamma delta", "en", "s", 22),   # shares all tris with 2
        (2, "alpha beta gamma delta", "en", "s", 22),   # exact dup of 1
        (3, "unique words entirely here", "en", "s", 26),  # all-novel
        (4, "alpha beta gamma epsilon", "en", "s", 24),  # 1 shared, 1 novel
        (5, "too short", "en", "s", 9),                  # <3 tokens → absent
    ]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = {r["doc_id"]: r for r in CQ.ngram_novelty_scores(spark, "x").collect()}
    assert set(got) == {1, 2, 3, 4}
    # dup pair: every trigram appears in the other doc → novelty 0
    assert got[1]["novelty_e4"] == 0 and got[2]["novelty_e4"] == 0
    assert got[3]["novelty_e4"] == 10000 and got[3]["n_novel"] == 2
    # doc 4: 'alpha beta gamma' shared (docs 1,2,4), 'beta gamma epsilon' novel
    assert (got[4]["n_distinct_ngrams"], got[4]["n_novel"]) == (2, 1)
    assert got[4]["novelty_e4"] == 5000


def test_repeated_ngram_within_one_doc_still_novel(spark, monkeypatch):
    """doc-frequency counts DISTINCT docs: a trigram repeated inside one doc
    is still corpus-novel (the DISTINCT before the df groupBy is what a
    naive explode-count would get wrong)."""
    rows = [(1, "x y z x y z x y z", "en", "s", 17)]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = CQ.ngram_novelty_scores(spark, "x").collect()
    assert len(got) == 1
    r = got[0]
    # trigrams: x y z (×3 positions), y z x (×2), z x y (×2) → 3 distinct
    assert (r["n_distinct_ngrams"], r["n_novel"], r["novelty_e4"]) == (3, 3, 10000)


def test_boilerplate_chunk_removal_handcrafted(spark, monkeypatch):
    """A 10-token chunk shared verbatim by >= 3 docs is removed; the rest
    survives. Doc 4 shares nothing and keeps 100%; the tail chunk (shorter
    than 10 tokens) counts with its real token mass."""
    boiler = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # one full chunk, 3-doc df
    rows = [
        (1, boiler + " a b c", "en", "s", 40),
        (2, boiler + " d e", "en", "s", 38),
        (3, boiler, "en", "s", 35),
        (4, "p q r s t u v w x y z1 z2", "en", "s", 30),
    ]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = {r["doc_id"]: r for r in CQ.boilerplate_chunk_removal(spark, "x").collect()}
    assert set(got) == {1, 2, 3, 4}
    # docs 1-3: chunk 0 is the shared boilerplate → removed; tails kept
    assert (got[1]["n_chunks"], got[1]["n_boiler"], got[1]["tokens_kept"]) == (2, 1, 3)
    assert got[1]["kept_frac_e6"] == 3 * 1_000_000 // 13
    assert (got[2]["n_chunks"], got[2]["n_boiler"], got[2]["tokens_kept"]) == (2, 1, 2)
    # doc 3 is pure boilerplate → everything removed
    assert (got[3]["n_boiler"], got[3]["tokens_kept"], got[3]["kept_frac_e6"]) == (1, 0, 0)
    # doc 4: 12 tokens → chunks of 10+2, nothing shared → kept 100%
    assert (got[4]["n_chunks"], got[4]["n_boiler"], got[4]["tokens_kept"]) == (2, 0, 12)
    assert got[4]["kept_frac_e6"] == 1_000_000


def test_boilerplate_two_doc_overlap_survives(spark, monkeypatch):
    """df == 2 is below the >= 3 threshold: a chunk shared by only two docs
    is legitimate overlap, not boilerplate (CCNet keeps it)."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    rows = [
        (1, shared, "en", "s", 35),
        (2, shared + " tail", "en", "s", 40),
    ]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = {r["doc_id"]: r for r in CQ.boilerplate_chunk_removal(spark, "x").collect()}
    assert got[1]["n_boiler"] == 0 and got[1]["kept_frac_e6"] == 1_000_000
    assert got[2]["n_boiler"] == 0 and got[2]["tokens_kept"] == 11


def test_unicode_nfc_audit_positive_path(spark, monkeypatch):
    """Decomposed accents and compatibility chars flag as non-NFC; the
    Python unicodedata pass must agree with DuckDB's utf8proc on both the
    flag and the normalized length."""
    import duckdb

    rows = [
        (1, "café latte", "fr", "s", 12),   # e + combining acute
        (2, "café latte", "fr", "s", 11),         # precomposed é
        (3, "plain ascii", "en", "s", 11),
        (4, "Å ring", "sv", "t", 7),        # A + combining ring
    ]
    monkeypatch.setattr(CQ, "t", lambda *_a: _docs_df(spark, rows))
    got = {r["source"]: r for r in CQ.unicode_nfc_audit(spark, "x").collect()}
    assert (got["s"].n_docs, got["s"].n_non_nfc) == (3, 1)
    assert (got["t"].n_docs, got["t"].n_non_nfc) == (1, 1)
    # cross-check every doc against DuckDB's implementation
    con = duckdb.connect()
    for _id, txt, _l, _src, _n in rows:
        nfc, ln = con.execute(
            "SELECT nfc_normalize(?) <> ?, length(nfc_normalize(?))",
            [txt, txt, txt],
        ).fetchone()
        import unicodedata

        assert nfc == (unicodedata.normalize("NFC", txt) != txt)
        assert ln == len(unicodedata.normalize("NFC", txt))


def test_domain_blocklist_suffix_semantics(spark):
    """PSL matching: a rule blocks the exact host and every subdomain,
    never a lookalike suffix — pinned on handcrafted hosts through the
    same suffix-expansion expressions the query uses."""
    from pyspark.sql import functions as F

    from storm_data_etl_spark.plans.corpus_queries import _host_blocked

    hosts = [
        ("ads.net", True),            # exact rule
        ("www.x.ads.net", True),      # subdomain inherits
        ("badads.net", False),        # lookalike suffix must NOT match
        ("tracker1.net", True),       # exact rule
        ("tracker2.net", False),      # sibling host
        ("net", False),               # bare TLD
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], ["host"])
    got = {
        r.host: r.b
        for r in df.select(
            "host", _host_blocked(F.col("host")).alias("b")
        ).collect()
    }
    assert got == dict(hosts)


def test_corpus_profile_invariants(spark, sf_dir):
    """The card's internal identities: dup count = docs - unique
    fingerprints; totals match direct recomputation; quality mean sits in
    the score's [0, 1] range."""
    from storm_data_etl_spark.plans.ml_queries import corpus_profile

    r = corpus_profile(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert r.n_docs == n
    assert r.n_exact_dups == r.n_docs - r.n_unique_fingerprints >= 0
    total_chars = sum(len(row.text or "") for row in docs.collect())
    assert r.total_chars == total_chars
    assert 0 <= r.mean_quality_e4 <= 10000
    assert r.n_sources == docs.select("source").distinct().count()


def test_stupid_backoff_leg_accounting(spark, sf_dir):
    """Per-leg counts must partition the trigram count; held-out scoring
    must actually exercise the backoff chain (a self-scored corpus never
    would); scores are mean log-probs (strictly negative)."""
    from storm_data_etl_spark.plans.corpus_queries import (
        stupid_backoff_trigram_score,
    )

    rows = stupid_backoff_trigram_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["n_tri_hits"] + r["n_bigram_backoffs"] + r["n_unigram_backoffs"]
            == r["n_trigrams"]
        )
        assert r["sb_score_e4"] < 0
    # Held-out docs must contain trigrams the 80% split never saw.
    assert sum(r["n_bigram_backoffs"] + r["n_unigram_backoffs"] for r in rows) > 0
    # Every scored doc is an eval-split doc with >= 3 tokens.
    lcg = lambda i: ((i % 2**31) * 1103515245 + 12345) % 2**31 % 100  # noqa: E731
    assert all(lcg(r["doc_id"]) >= 80 for r in rows)


def test_quality_threshold_sweep_monotone(spark, sf_dir):
    from storm_data_etl_spark.plans.ml_queries import quality_threshold_sweep

    rows = sorted(
        quality_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r["threshold_e4"],
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert [r["threshold_e4"] for r in rows] == [i * 1000 for i in range(11)]
    assert rows[0]["n_docs_kept"] == docs and rows[0]["pct_docs_e4"] == 10000
    for lo, hi in zip(rows[1:], rows):
        assert lo["n_docs_kept"] <= hi["n_docs_kept"]
        assert lo["tokens_kept"] <= hi["tokens_kept"]
    assert all(0 <= r["pct_docs_e4"] <= 10000 for r in rows)


def test_mojibake_audit_construction_counts(spark, sf_dir):
    """The deterministic corruption makes expected per-source counts a
    closed form over doc_ids; clean docs must have no detector hits."""
    from storm_data_etl_spark.plans import corpus_queries as CQ

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    exp = {}
    for r in docs:
        e = exp.setdefault(r.source, [0, 0, 0, 0])
        e[0] += 1
        if r.doc_id % 11 == 0:
            e[1] += 1
        if r.doc_id % 13 == 0:
            e[2] += 1
        if r.doc_id % 17 == 0:
            e[3] += 1
    out = {r.source: r for r in CQ.mojibake_audit(spark, sf_dir).collect()}
    assert set(out) == set(exp)
    for src, (n, n11, n13, n17) in exp.items():
        r = out[src]
        assert r.n_docs == n
        # base corpus is clean -> detector hits equal injected corruption
        assert r.n_replacement == n11 and r.total_repl_chars == n11
        assert r.n_double_encoded == n13
        assert r.n_control == n17


def test_unigram_sampling_power_law(spark, tmp_path):
    """w_e4 equals floor(1e4 * f^0.75) via the same sqrt(sqrt(f^3))
    route; sub-5-frequency tokens are excluded; shares sum to <= 1e9."""
    import math

    from storm_data_etl_spark.plans import corpus_queries as CQ

    text = " ".join(["alpha"] * 16 + ["beta"] * 5 + ["gamma"] * 4)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {r.token: r for r in
            CQ.unigram_sampling_table(spark, str(tmp_path)).collect()}
    assert set(rows) == {"alpha", "beta"}  # gamma: freq 4 < 5
    for tok, f in (("alpha", 16), ("beta", 5)):
        expect = math.floor(10000 * math.sqrt(math.sqrt(float(f * f * f))))
        assert rows[tok].w_e4 == expect
    assert rows["alpha"].freq_rank == 1 and rows["beta"].freq_rank == 2
    total = sum(r.share_e9 for r in rows.values())
    assert 0 < total <= 10**9


def test_packing_sweep_matches_python(spark, sf_dir):
    """Per-L sweep equals a pure-Python replay of the prefix-sum layout,
    and agrees with sequence_packing_stats at L=256."""
    from storm_data_etl_spark.plans import ml_queries as MQ

    docs = sorted(
        (r.doc_id, len(r.text.split()))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if r.text is not None and r.text.strip()
    )
    out = {r.ctx_len: r for r in MQ.packing_context_sweep(spark, sf_dir).collect()}
    total = sum(n for _, n in docs)
    for L in (128, 256, 512, 1024):
        s = 0
        crossing = 0
        for _, n in docs:
            if s // L != (s + n - 1) // L:
                crossing += 1
            s += n
        r = out[L]
        assert r.total_tokens == total and r.n_docs == len(docs)
        assert r.n_sequences == (total + L - 1) // L
        assert r.n_crossing_docs == crossing
        assert r.tail_waste_tokens == r.n_sequences * L - total
    seq = MQ.sequence_packing_stats(spark, sf_dir).collect()
    assert sum(r.n_tokens for r in seq) == total


def test_texttiling_detects_vocabulary_shift(spark, tmp_path):
    """A doc whose first half repeats one vocabulary and second half
    another has exactly one sharp boundary; a homogeneous doc has none."""
    from storm_data_etl_spark.plans import corpus_queries as CQ

    topical = " ".join(["cat dog bird fish lion tiger bear wolf fox deer"] * 4
                       + ["sql spark shuffle join scan filter agg sort hash plan"] * 4)
    uniform = " ".join(["one two three four five six seven eight nine ten"] * 8)
    _docs = [
        (1, topical, "en", "s", len(topical)),
        (2, uniform, "en", "s", len(uniform)),
    ]
    spark.createDataFrame(
        _docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in CQ.texttiling_boundaries(spark, str(tmp_path)).collect()}
    # 80 tokens -> 4 blocks -> 3 adjacent sims; vocab flips between block 1 and 2
    assert out[1].n_blocks == 4 and out[1].n_boundaries == 1
    assert out[1].min_overlap == 0
    assert out[2].n_boundaries == 0 and out[2].min_overlap == 10


def test_prefix_sharing_cacheable_mass(spark, tmp_path):
    """Three docs sharing an 8-token prefix (two of them to 16) yield the
    closed-form cacheable token mass at each depth."""
    from storm_data_etl_spark.plans import corpus_queries as CQ

    p16 = "a b c d e f g h i j k l m n o p"
    docs = [
        (1, p16 + " x1 y1 z1", "en", "s", 0),
        (2, p16 + " x2 y2 z2", "en", "s", 0),
        (3, "a b c d e f g h DIFF tail tail tail tail tail tail tail tail", "en", "s", 0),
        (4, "totally different opener tokens here for the fourth doc ok", "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.depth: r for r in CQ.prefix_sharing_stats(spark, str(tmp_path)).collect()}
    # depth 4: docs 1,2,3 share 'a b c d' -> group of 3 -> (3-1)*4 = 8
    assert out[4].cacheable_tokens == 8 and out[4].max_group == 3
    # depth 8: same trio shares 8 tokens -> (3-1)*8 = 16
    assert out[8].cacheable_tokens == 16
    # depth 16: only docs 1,2 qualify and share -> (2-1)*16 = 16
    assert out[16].cacheable_tokens == 16 and out[16].max_group == 2
