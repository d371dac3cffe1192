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


# ---------------------------------------------------------------------
# Span corruption / tool-call traces / bitext / curriculum
# ---------------------------------------------------------------------

def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _lcg_value(i: int) -> int:
    return ((i % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M


def test_span_corruption_python_replica(spark, sf_dir):
    """Full Python replica of the stratified placement on the real corpus:
    spans must be disjoint, inside the doc, and digest-identical."""
    rows = SQ.span_corruption_plan(spark, sf_dir).collect()
    docs = {
        r.doc_id: (r.text or "")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    checked = 0
    for r in rows:
        n_tok = len(docs[r.doc_id].split())
        assert n_tok >= 8 and r.n_tok == n_tok
        n_spans = max(1, n_tok * 15 // 100 // 3)
        assert r.n_spans == n_spans
        spans = []
        for k in range(n_spans):
            seg_start = k * n_tok // n_spans
            seg_len = (k + 1) * n_tok // n_spans - seg_start
            span_len = min(3, seg_len)
            off = _lcg_value(r.doc_id * 131 + k) % (seg_len - span_len + 1)
            spans.append((seg_start + off, span_len))
        # disjoint + in-bounds
        for (s1, l1), (s2, _l2) in zip(spans, spans[1:]):
            assert s1 + l1 <= s2
        assert spans[-1][0] + spans[-1][1] <= n_tok
        assert r.masked_tokens == sum(l for _, l in spans)
        digest = hashlib.md5(
            ",".join(f"{s}:{l}" for s, l in spans).encode()
        ).hexdigest()
        assert r.spans_md5 == digest
        checked += 1
    assert checked > 100


def test_toolcall_trace_handcrafted(spark, tmp_path):
    """Orphan result, unclosed call, and a perfectly bracketed trace."""
    import datetime as dt

    def ev(eid, user, typ):
        return (eid, dt.datetime(2024, 1, 1, 0, 0, eid), user, typ, 1.0, "{}")

    rows = [
        # user 1: call result call call result result -> valid, depth 2
        ev(1, 1, "click"), ev(2, 1, "purchase"), ev(3, 1, "click"),
        ev(4, 1, "click"), ev(5, 1, "purchase"), ev(6, 1, "purchase"),
        # user 2: result first (orphan), then call -> invalid, unclosed 0...
        ev(7, 2, "purchase"), ev(8, 2, "click"),
        # user 3: two calls never closed
        ev(9, 3, "click"), ev(10, 3, "view"), ev(11, 3, "click"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.user_id: r for r in SQ.toolcall_trace_audit(spark, str(tmp_path)).collect()}
    assert out[1].is_valid and out[1].max_depth == 2 and out[1].n_orphan_results == 0
    assert not out[2].is_valid and out[2].n_orphan_results == 1
    assert out[2].min_depth == -1 and out[2].unclosed_calls == 0
    assert not out[3].is_valid and out[3].unclosed_calls == 2 and out[3].n_results == 0


def test_bitext_ratio_boundary(spark, tmp_path):
    """Exactly 2:1 is KEPT (<=); 2:1 plus one token is dropped; an empty
    side is counted as empty, not ratio."""
    _write_docs(spark, str(tmp_path), [
        (0, "a b c d", "en", "s", 7),        # 4 tokens
        (1, "x y", "fr", "s", 3),            # 2 tokens -> exactly 2:1, kept
        (2, "a b c d e", "en", "s", 9),      # 5 tokens
        (3, "x y", "fr", "s", 3),            # 2 -> 5 > 4, ratio drop
        (4, "", "en", "s", 0),               # empty side
        (5, "x", "fr", "s", 1),
    ])
    out = {(r.src_lang, r.tgt_lang): r
           for r in SQ.bitext_length_ratio_filter(spark, str(tmp_path)).collect()}
    r = out[("en", "fr")]
    assert r.n_pairs == 3 and r.n_kept == 1 and r.n_ratio_drop == 1 and r.n_empty == 1
    assert r.kept_src_tokens == 4 and r.kept_tgt_tokens == 2


def test_curriculum_phase_bands_and_digest(spark, tmp_path):
    """Band boundaries at 150-char multiples, capped at phase 3; the shard
    digest replays the (lcg, doc_id) order."""
    docs = [
        (0, "one two", "en", "s", 149),    # phase 0
        (1, "three", "en", "s", 150),      # phase 1
        (2, "four five six", "en", "s", 449),   # phase 2
        (3, "seven", "en", "s", 1000),     # phase 3 (capped)
        (4, "eight nine", "en", "s", 600), # phase 3
    ]
    _write_docs(spark, str(tmp_path), docs)
    out = SQ.curriculum_schedule_plan(spark, str(tmp_path)).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(r.phase, []).append(r)
    assert {p: sum(r.n_docs for r in rs) for p, rs in by_phase.items()} == {
        0: 1, 1: 1, 2: 1, 3: 2,
    }
    # replay phase 3's digests
    p3 = {(r.shard): r for r in by_phase[3]}
    mine = {}
    for doc_id in (3, 4):
        sk = _lcg_value(doc_id)
        mine.setdefault(sk % 8, []).append((sk, doc_id))
    for shard, members in mine.items():
        ids = ",".join(str(i) for _, i in sorted(members))
        assert p3[shard].order_md5 == hashlib.md5(ids.encode()).hexdigest()


def test_recency_weighting_halving(spark, tmp_path):
    """Ages 0/7/14 days halve to weights 1000/500/250; ESS matches the
    closed form (sum w)^2 / sum w^2."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base + dt.timedelta(days=14), 1, "click", 1.0, "{}"),  # age 0
        (2, base + dt.timedelta(days=7), 1, "click", 1.0, "{}"),   # age 7
        (3, base, 1, "click", 1.0, "{}"),                          # age 14
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.event_type: r for r in
           SQ.recency_weighting_plan(spark, str(tmp_path)).collect()}
    r = out["click"]
    assert r.total_weight_e3 == 1000 + 500 + 250
    sw, sw2 = 1750, 1000**2 + 500**2 + 250**2
    assert r.ess_e4 == (10000 * sw * sw) // sw2
    assert r.mean_weight_e4 == (10000 * sw) // (1000 * 3)
