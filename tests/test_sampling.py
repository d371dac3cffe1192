"""Tests for deterministic splitting and token-shard packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_data_etl_spark.operators import sampling as SP


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in SP.hash_split(df, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in SP.hash_split(df.repartition(7), "doc_id").collect()
    }
    assert a == b  # partitioning must not change assignment
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    # 80/10/10 within a loose tolerance on 2000 uniform-ish ids
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.16
    assert 0.05 < counts["test"] / 2000 < 0.16


def test_hash_split_matches_sql_model(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    got = SP.hash_split(df, "doc_id").select("doc_id", "split").collect()
    a, c, m = 1103515245, 12345, 2_147_483_648
    for r in got:
        b = (((r.doc_id % m) * a + c) % m) % 100
        expected = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r.split == expected, (r.doc_id, b)


def test_pack_token_shards_exact(spark):
    rows = [(1, 40), (2, 50), (3, 30), (4, 250), (5, 10), (6, 95)]
    df = spark.createDataFrame(rows, "doc_id int, toks int")
    got = {
        r.doc_id: r.shard
        for r in SP.pack_token_shards(df, "toks", "doc_id", budget=100).collect()
    }
    # exclusive prefix sums: 0,40,90,120,370,380 → shards 0,0,0,1,3,3
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 3, 6: 3}


def test_stratified_sample_monotone_and_deterministic(spark):
    from storm_data_etl_spark.operators.sampling import stratified_hash_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(500)], "doc_id long, lang string"
    )
    lo = stratified_hash_sample(df, "doc_id", "lang", {"en": 20, "zh": 100})
    hi = stratified_hash_sample(df, "doc_id", "lang", {"en": 60, "zh": 100})
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids  # raising a rate only adds rows
    assert lo_ids == {r.doc_id for r in lo.collect()}  # rerun-stable
    # zh kept in full
    zh = {r.doc_id for r in df.filter("lang = 'zh'").collect()}
    assert zh <= hi_ids
    # en rate lands near 20%/60% of 250
    n_en_lo = len(lo_ids - zh)
    n_en_hi = len(hi_ids - zh)
    assert 30 <= n_en_lo <= 70 and 120 <= n_en_hi <= 180


def test_weighted_hash_sample_extremes_and_monotonicity(spark, sf_dir):
    from pyspark.sql import functions as F

    from storm_data_etl_spark.operators.sampling import weighted_hash_sample
    from storm_data_etl_spark.plans.tables import t

    docs = t(spark, sf_dir, "documents")
    n = docs.count()
    assert weighted_hash_sample(docs, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_hash_sample(docs, "doc_id", F.lit(1.0)).count() == n
    assert weighted_hash_sample(docs, "doc_id", F.lit(5.0)).count() == n  # clamped
    low = weighted_hash_sample(docs, "doc_id", F.lit(0.2))
    high = weighted_hash_sample(docs, "doc_id", F.lit(0.8))
    n_low, n_high = low.count(), high.count()
    assert 0 < n_low < n_high < n
    # raising the weight only ADDS rows (supersets, like stratified rates)
    low_ids = {r["doc_id"] for r in low.select("doc_id").collect()}
    high_ids = {r["doc_id"] for r in high.select("doc_id").collect()}
    assert low_ids <= high_ids


def test_weighted_sample_without_replacement_properties(spark):
    """A-ES invariants: exactly k per group (when the group has >= k
    positive-weight rows), no duplicates, zero-weight rows never selected,
    deterministic across calls, and heavier rows win more often across
    many disjoint groups (statistical sanity on the fixed LCG)."""
    from pyspark.sql import functions as F

    from storm_data_etl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = []
    # 200 groups; in each, doc 10*g+1 has weight 50, others weight 1
    for g in range(200):
        for j in range(5):
            rows.append((10 * g + j, f"g{g}", 50.0 if j == 1 else 1.0))
        rows.append((10 * g + 9, f"g{g}", 0.0))  # never selectable
    df = spark.createDataFrame(rows, ["doc_id", "grp", "wt"])
    out = weighted_sample_without_replacement(df, "doc_id", "wt", "grp", k=2).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r.doc_id)
    assert len(by_grp) == 200
    heavy_wins = 0
    for g, ids in by_grp.items():
        assert len(ids) == 2 and len(set(ids)) == 2
        assert all(i % 10 != 9 for i in ids)  # zero weight excluded
        gnum = int(g[1:])
        if 10 * gnum + 1 in ids:
            heavy_wins += 1
    # weight 50 vs four weight-1 rows → P(in top2) ≈ 0.96+; demand > 0.8
    assert heavy_wins / 200 > 0.8, heavy_wins
    # deterministic
    again = {(r.grp, r.doc_id) for r in
             weighted_sample_without_replacement(df, "doc_id", "wt", "grp", k=2).collect()}
    assert again == {(r.grp, r.doc_id) for r in out}


def test_global_prefix_sum_matches_python_model(spark):
    """Two-phase distributed prefix sum == single-threaded fold, across a
    row count that forces many range partitions and non-contiguous ids."""
    import random

    rng = random.Random(7)
    rows = [(i * 3 + 1, rng.randrange(1, 500)) for i in range(997)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "doc_id int, v int").repartition(13)
    got = {
        r.doc_id: r.prefix_sum
        for r in SP.global_prefix_sum(df, "v", ["doc_id"], num_partitions=11).collect()
    }
    acc = 0
    for did, v in sorted(rows):
        assert got[did] == acc, (did, got[did], acc)
        acc += v
    from storm_data_etl_spark.session import release_pinned

    release_pinned()


def test_global_prefix_sum_single_row_and_empty(spark):
    df = spark.createDataFrame([(5, 42)], "doc_id int, v int")
    assert SP.global_prefix_sum(df, "v", ["doc_id"]).collect()[0].prefix_sum == 0
    empty = spark.createDataFrame([], "doc_id int, v int")
    assert SP.global_prefix_sum(empty, "v", ["doc_id"]).count() == 0
    from storm_data_etl_spark.session import release_pinned

    release_pinned()


def test_sequence_packing_handcrafted(spark, monkeypatch):
    """Three docs of 300/200/100 tokens, S=256. Offsets: doc1 [0,300)
    spans seqs 0-1; doc2 [300,500) fits inside seq 1; doc3 [500,600)
    starts before the 512 boundary so it crosses seqs 1-2."""
    from storm_data_etl_spark.plans import ml_queries as MQ

    rows = [
        (1, " ".join(["w"] * 300), "en", "s", 300),
        (2, " ".join(["w"] * 200), "en", "s", 200),
        (3, " ".join(["w"] * 100), "en", "s", 100),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(MQ, "t", lambda *_a: df)
    got = {r.seq_id: r for r in MQ.sequence_packing_stats(spark, "x").collect()}
    # spans: doc1 [0,300) seqs 0-1; doc2 [300,500) seq 1; doc3 [500,600) seqs 1-2
    assert set(got) == {0, 1, 2}
    assert (got[0].n_docs, got[0].n_tokens, got[0].n_full_docs) == (1, 256, 0)
    assert (got[1].n_docs, got[1].n_tokens, got[1].n_full_docs) == (3, 256, 1)
    assert (got[2].n_docs, got[2].n_tokens, got[2].n_full_docs) == (1, 88, 0)
    # total tokens conserved
    assert sum(r.n_tokens for r in got.values()) == 600
    from storm_data_etl_spark.session import release_pinned

    release_pinned()


def test_padding_efficiency_handcrafted(spark, monkeypatch):
    """Uniform-length docs pad to zero; one straggler pads its whole batch
    up to its own length."""
    from storm_data_etl_spark.plans import ml_queries as MQ

    # 8 docs of 10 tokens (band 0, one per sub-bucket → 8 batches of 1,
    # zero padding) + 2 docs of 100 and 120 tokens in band 1.
    rows = [(i, " ".join(["w"] * 10), "en", "s", 10) for i in range(8)]
    rows += [
        (8, " ".join(["w"] * 100), "en", "s", 100),   # sub 0
        (16, " ".join(["w"] * 120), "en", "s", 120),  # sub 0, same batch
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(MQ, "t", lambda *_a: df)
    got = {r.band: r for r in MQ.padding_efficiency_stats(spark, "x").collect()}
    assert set(got) == {0, 1}
    assert (got[0].n_docs, got[0].padded_tokens) == (8, 0)
    # band 1: one batch of [100, 120] → pad 100 → 120 costs 20
    assert (got[1].n_docs, got[1].n_batches) == (2, 1)
    assert (got[1].useful_tokens, got[1].padded_tokens) == (220, 20)
    assert got[1].padding_frac_e6 == 1_000_000 * 20 // 240


def test_group_split_leakage_audit_semantics(spark, sf_dir):
    """The user-keyed split is exactly leak-free; the row-keyed split
    leaks (multi-event users land in both splits on this fixture)."""
    from storm_data_etl_spark.plans.ml_queries import group_split_leakage_audit

    r = group_split_leakage_audit(spark, sf_dir).collect()[0]
    assert r.n_users > 0
    assert r.leaky_users_by_user == 0
    assert r.leaky_users_by_row > 0


def test_mixture_epoch_plan_semantics(spark, monkeypatch):
    """The scarce 3-part source binds the epoch; every source's cap is
    parts * T with T set by the binding source; rates never exceed 1."""
    from storm_data_etl_spark.plans import ml_queries as MQ

    # src0: 3 parts, 90 tokens -> 30 units; src5: 1 part, 100 -> 100 units
    # src3: 2 parts, 100 -> 50 units.  T = 30, bound by src0.
    rows = [
        (1, " ".join(["w"] * 90), "en", "src0", 90),
        (2, " ".join(["w"] * 100), "en", "src3", 100),
        (3, " ".join(["w"] * 100), "en", "src5", 100),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(MQ, "t", lambda *_a: df)
    got = {r.source: r for r in MQ.mixture_epoch_plan(spark, "x").collect()}
    assert got["src0"].binding and not got["src3"].binding and not got["src5"].binding
    assert (got["src0"].tokens_at_cap, got["src3"].tokens_at_cap, got["src5"].tokens_at_cap) == (90, 60, 30)
    assert got["src0"].sampling_rate_e6 == 1_000_000
    assert got["src3"].sampling_rate_e6 == 600_000
    assert got["src5"].sampling_rate_e6 == 300_000
    for r in got.values():
        assert r.tokens_at_cap <= r.tokens_available
