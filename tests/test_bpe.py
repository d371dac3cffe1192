"""Tests for the BPE tokenizer trainer (operators/bpe.py): learned merges
against an independent reference implementation, segmentation consistency
with training, and the distributed stats pipeline."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from storm_data_etl_spark.operators import bpe as B


def _ref_train(words_counts: dict[str, int], n_merges: int):
    """Independent naive reference: apply each learned merge sequentially
    across the whole vocab (the paper's formulation; operators/bpe.py is
    judged against this, not vice versa)."""
    vocab = {tuple(w) + (B.EOW,): c for w, c in words_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for wd, c in vocab.items():
            for a, b in zip(wd, wd[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        mc = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mc)
        merges.append(best)
        nv: dict[tuple, int] = {}
        for wd, c in vocab.items():
            out, i = [], 0
            while i < len(wd):
                if i + 1 < len(wd) and (wd[i], wd[i + 1]) == best:
                    out.append(wd[i] + wd[i + 1])
                    i += 2
                else:
                    out.append(wd[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges, vocab


CORPUS_COUNTS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus_df(spark):
    text = " ".join(w for w, c in CORPUS_COUNTS.items() for _ in range(c))
    return spark.createDataFrame([(1, text, "s0")], ["doc_id", "text", "source"])


def test_train_matches_reference(spark):
    merges = B.train_bpe_merges(_corpus_df(spark), n_merges=10)
    ref_merges, _ = _ref_train(CORPUS_COUNTS, 10)
    assert merges == ref_merges
    # the classic Sennrich corpus learns ('e','s') then ('es','t') first
    assert merges[:2] == [("e", "s"), ("es", "t")]


def test_segmentation_reproduces_training_vocab(spark):
    """Min-rank-first application (GPT-2 style) must land on exactly the
    decomposition sequential training produced for every training word."""
    merges, final_vocab = _ref_train(CORPUS_COUNTS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for wd in CORPUS_COUNTS:
        seg = B.segment_word(wd, ranks)
        match = [v for v in final_vocab if "".join(v) == wd + B.EOW]
        assert len(match) == 1
        assert tuple(seg) == match[0]


def test_unseen_word_still_segments():
    merges, _ = _ref_train(CORPUS_COUNTS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # "lowest" never appeared, but shares subwords with low/newest
    seg = B.segment_word("lowest", ranks)
    assert "".join(seg) == "lowest" + B.EOW  # lossless
    assert len(seg) < len("lowest") + 1  # some merges applied
    assert "low" in seg or "est</w>" in seg


def test_corpus_stats_pipeline(spark):
    df = _corpus_df(spark)
    merges = B.train_bpe_merges(df, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    out = B.bpe_corpus_stats(df, merges).collect()
    assert len(out) == 1
    row = out[0]
    n_words = sum(CORPUS_COUNTS.values())
    exp_subwords = sum(len(B.segment_word(w, ranks)) * c for w, c in CORPUS_COUNTS.items())
    assert row.n_words == n_words
    assert row.n_subwords == exp_subwords
    assert row.compression_e3 == int(1000 * exp_subwords / n_words)


def test_zero_merges_falls_back_to_characters(spark):
    out = B.bpe_corpus_stats(_corpus_df(spark), []).collect()[0]
    exp = sum((len(w) + 1) * c for w, c in CORPUS_COUNTS.items())
    assert out.n_subwords == exp


def test_registered_query_runs(spark, sf_dir):
    from storm_data_etl_spark.plans import ml_queries as MQ

    rows = MQ.bpe_subword_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # subword count is bounded by characters+1 and below by words
        assert r.n_words <= r.n_subwords
        assert r.compression_e3 >= 1000


def test_vocab_collect_is_capped(spark):
    """top_words is a driver collect() bound — an oversized request must
    raise before any job runs (driver-OOM guard at 100 TB)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="driver-safe"):
        B.train_bpe_merges(_corpus_df(spark), top_words=B.MAX_DRIVER_VOCAB + 1)


def test_zero_merge_segmentation_is_characters(spark):
    """With no learned merges every word segments to its characters plus
    the end-of-word marker — the closed form the bpe_zero_merge_regime
    gate entry relies on."""
    from storm_data_etl_spark.operators.bpe import segment_word, segment_words_df

    assert segment_word("hello", {}) == ["h", "e", "l", "l", "o", "</w>"]
    assert segment_word("a", {}) == ["a", "</w>"]
    words = spark.createDataFrame([("spark",), ("x",)], ["w"])
    got = {r.w: r.n_subwords for r in segment_words_df(words, []).collect()}
    assert got == {"spark": 6, "x": 2}
