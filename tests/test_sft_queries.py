"""Unit tests for the SFT / data-loading family (plans/sft_queries.py):
WARC framing on handcrafted bytes (including the payload-contains-CRLFCRLF
trap), build→parse roundtrip reconciliation, a pure-Python replica of the
chat-template render, epoch-shuffle determinism, and fertility/pair
invariants. Cross-engine value parity runs via tools/pandas_parity_check.py
and the driver's gate."""

from __future__ import annotations

import hashlib

from storm_data_etl_spark.operators import warc as W
from storm_data_etl_spark.plans import sft_queries as SQ

_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2_147_483_648


def _lcg_bucket(i: int, n: int = 100) -> int:
    return ((i % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M % n


def _record(doc_id: int, source: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.1\r\nWARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: https://{source}.example.com/doc/{doc_id}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_warc_scan_frames_by_content_length_not_delimiter():
    """A payload containing the CRLFCRLF header terminator must NOT split
    the record — framing is Content-Length, never delimiter search."""
    trap = b"body with\r\n\r\nembedded terminator"
    blob = _record(7, "srcA", trap) + _record(8, "srcB", b"plain")
    recs = list(W._scan(blob))
    assert [r[0] for r in recs] == [7, 8]
    assert all(r[4] for r in recs)
    assert recs[0][2] == len(trap)
    assert recs[0][3] == hashlib.md5(trap).hexdigest()
    assert recs[0][1] == "srcA" and recs[1][1] == "srcB"


def test_warc_scan_truncation_and_garbage():
    good = _record(1, "s", b"xyz")
    # Truncated mid-payload: one not-ok row, rest abandoned (framing lost).
    recs = list(W._scan(good[:-6]))
    assert recs[-1][4] is False
    # Garbage magic: immediate not-ok.
    recs = list(W._scan(b"HTTP/1.1 200 OK\r\n\r\nnope"))
    assert recs == [(-1, "", 0, "", False)]
    # Empty blob: no records at all.
    assert list(W._scan(b"")) == []


def test_warc_roundtrip_reconciles(spark, sf_dir):
    rows = SQ.warc_ingest_stats(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == 16
    assert sum(r["n_records"] for r in rows) == docs
    assert all(r["n_parse_errors"] == 0 for r in rows)
    assert all(r["n_distinct_hosts"] >= 1 for r in rows)


def test_chat_template_matches_python_replica(spark, sf_dir):
    """Full independent replica: roles via the LCG, pieces rendered and
    md5'd in turn order, alternation audited — every output column."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    threads: dict[int, list[tuple[int, str, str]]] = {}
    for doc_id, text in docs.items():
        role = "user" if _lcg_bucket(doc_id) < 50 else "assistant"
        threads.setdefault(doc_id // 4, []).append((doc_id % 4, role, text or ""))
    out = {r["thread_id"]: r for r in SQ.chat_template_render_stats(spark, sf_dir).collect()}
    assert set(out) == set(threads)
    for tid, turns in threads.items():
        turns.sort()
        r = out[tid]
        roles = [role for _, role, _ in turns]
        assert r["n_turns"] == len(turns)
        assert r["n_user_turns"] == roles.count("user")
        assert r["n_asst_turns"] == roles.count("assistant")
        assert r["first_role"] == roles[0]
        expected_valid = all(
            role == ("user" if i % 2 == 0 else "assistant")
            for i, role, _ in turns
        )
        assert r["valid_alternation"] is expected_valid
        rendered = "".join(f"<|{role}|>{body}<|end|>" for _, role, body in turns)
        assert r["render_md5"] == hashlib.md5(rendered.encode()).hexdigest()
        prompt = sum(len(body.split()) for _, role, body in turns if role == "user")
        assert r["prompt_tokens"] == prompt


def test_epoch_shuffle_plan_deterministic_and_complete(spark, sf_dir):
    a = sorted(SQ.epoch_shuffle_plan(spark, sf_dir).collect(), key=lambda r: r["shard"])
    b = sorted(SQ.epoch_shuffle_plan(spark, sf_dir).collect(), key=lambda r: r["shard"])
    assert [r["order_digest"] for r in a] == [r["order_digest"] for r in b]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in a) == docs
    assert {r["shard"] for r in a} <= set(range(16))
    assert all(r["min_key"] <= r["max_key"] for r in a)


def test_fertility_bounds(spark, sf_dir):
    rows = SQ.tokenizer_fertility_by_lang(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Every whitespace word decomposes into >= 1 pre-token unit.
        assert r["total_subtokens"] >= r["total_words"] > 0
        assert r["fertility_e4"] >= 10000
        assert r["chars_per_subtoken_e4"] > 0


def test_rlhf_pair_accounting(spark, sf_dir):
    rows = SQ.rlhf_preference_pair_stats(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_pairs"] for r in rows) == docs // 2
    for r in rows:
        assert r["n_ties"] + r["n_a_wins"] + r["n_b_wins"] == r["n_pairs"]
        assert r["n_winner_longer"] <= r["n_a_wins"] + r["n_b_wins"]
        assert r["mean_margin_e4"] >= 0


def test_xml_feed_roundtrip_counts(spark, sf_dir):
    rows = SQ.xml_feed_parse_stats(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.filter("source is not null and doc_id is not null and lang is not null").count()
    assert sum(r["n_items"] for r in rows) == n
    assert all(r["n_langs"] >= 1 for r in rows)


def test_xml_feed_unescapes_entities(spark, monkeypatch):
    """A title containing XML-special characters must survive the
    escape → from_xml → unescape roundtrip into the digest."""
    df = spark.createDataFrame(
        [(1, "a&b <c> d e", "en", "s1", 11), (2, "plain words here", "en", "s1", 16)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    monkeypatch.setattr(SQ, "t", lambda *_: df)
    row = SQ.xml_feed_parse_stats(spark, "ignored").collect()[0]
    expected = hashlib.md5("a&b <c> d|plain words here".encode()).hexdigest()
    assert row["n_items"] == 2
    assert row["title_digest"] == expected


def test_dp_noise_bounded_and_deterministic(spark, sf_dir):
    from storm_data_etl_spark.plans.ml_queries import dp_noise_histogram

    a = sorted(dp_noise_histogram(spark, sf_dir).collect(), key=lambda r: r["event_type"])
    b = sorted(dp_noise_histogram(spark, sf_dir).collect(), key=lambda r: r["event_type"])
    assert [r["noised_count_e4"] for r in a] == [r["noised_count_e4"] for r in b]
    for r in a:
        noise = r["noised_count_e4"] / 10000 - r["true_count"]
        # Laplace(1) inverse-CDF of a u bounded away from {0,1} by 1/2^31.
        assert abs(noise) <= 22.5
        assert noise != 0.0
