"""Tests for the text-analysis expression library."""

from __future__ import annotations

from storm_data_etl_spark.functions import text as X


def _one(spark, col, *rows_schema):
    rows, schema = rows_schema
    return [r[0] for r in spark.createDataFrame(rows, schema).select(col).collect()]


def test_token_count(spark):
    cases = [("a b c", 3), ("  one   two  ", 2), ("", 0), ("single", 1)]
    got = _one(spark, X.token_count("t"), [(c,) for c, _ in cases], "t string")
    assert got == [e for _, e in cases]


def test_bpe_ish_token_count(spark):
    got = _one(
        spark,
        X.bpe_ish_token_count("t"),
        [("Hello, world 123!",), ("",)],
        "t string",
    )
    # Hello | , | world | 123 | !  → 5 pre-tokens
    assert got == [5, 0]


def test_fingerprint_stable_under_jitter(spark):
    df = spark.createDataFrame(
        [("Hello,   World!",), ("hello world",), ("HELLO ... world",), ("other",)],
        "t string",
    )
    fps = [r[0] for r in df.select(X.fingerprint("t")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_shingles(spark):
    got = _one(spark, X.shingles("t", 2), [("a b c",), ("solo",)], "t string")
    assert sorted(got[0]) == ["a b", "b c"]
    assert got[1] == ["solo"]


def test_shingles_overlap_and_unicode(spark):
    # the lookahead-regex formulation must anchor at every word start,
    # including non-ASCII word chars (Java \b is Unicode-aware) — pinned
    # because an ASCII-only \b would silently split mid-word on umlauts
    cases = [
        ("für das wörld bär tüv", ["für das wörld", "das wörld bär", "wörld bär tüv"]),
        ("的 是 在 了", ["的 是 在", "是 在 了"]),
        ("caffè niño señor año", ["caffè niño señor", "niño señor año"]),
        ("one two three", ["one two three"]),
        ("a a a a", ["a a a"]),  # distinct collapses repeated grams
        ("", [""]),
    ]
    got = _one(spark, X.shingles("t", 3), [(c,) for c, _ in cases], "t string")
    assert got == [e for _, e in cases]


def test_lang_id_obvious(spark):
    cases = [
        ("the cat and the dog sat in a house for a while", "en"),
        ("der hund und die katze ist von dem haus", "de"),
        ("el perro y la casa es una de las cosas", "es"),
        ("le chien et le chat est dans la maison pour un", "fr"),
        ("这是一个人的和有我不了", "zh"),
        ("qqq zzz xxx", "und"),
    ]
    got = _one(spark, X.lang_id("t"), [(c,) for c, _ in cases], "t string")
    assert got == [e for _, e in cases]


def test_quality_score_monotone_signals(spark):
    good = "The quick brown fox jumps over the lazy dog and runs far away. " * 5
    bad = "@@@ ### !!! ??? %%% ^^^ &&&"
    df = spark.createDataFrame([(good,), (bad,)], "t string")
    scores = [r[0] for r in df.select(X.quality_score("t")).collect()]
    assert scores[0] > scores[1]
    assert 0.0 <= scores[1] <= scores[0] <= 1.0


def test_punct_and_ratios(spark):
    df = spark.createDataFrame([("ab!?",), ("",)], "t string")
    p = [r[0] for r in df.select(X.punct_ratio("t")).collect()]
    assert abs(p[0] - 0.5) < 1e-9 and p[1] == 0.0
