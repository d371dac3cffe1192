"""Bloom-filter membership (operators/bloom.py): no false negatives, FPR
within the textbook bound, duplicate/NULL probe handling, and the
exactness-regime degeneration the gate query relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_data_etl_spark.operators import bloom as B


def _keys_df(spark, keys, col="k"):
    return spark.createDataFrame([(x,) for x in keys], f"{col} string")


def test_no_false_negatives_and_bounded_fpr(spark):
    inserted = [f"key-{i}" for i in range(300)]
    absent = [f"other-{i}" for i in range(1000)]
    m, k = 1 << 12, 4
    positions = B.bloom_build(_keys_df(spark, inserted), "k", m_bits=m, k_hashes=k)
    flagged = {
        r["k"]: r["might_contain"]
        for r in B.bloom_might_contain(
            _keys_df(spark, inserted + absent), "k", positions, m_bits=m, k_hashes=k
        ).collect()
    }
    # every inserted key tests positive — the defining guarantee
    assert all(flagged[x] for x in inserted)
    fpr = sum(flagged[x] for x in absent) / len(absent)
    expected = B.expected_fpr(len(inserted), m, k)
    assert fpr <= max(3 * expected, 0.02), (fpr, expected)


def test_duplicate_and_null_probe_rows(spark):
    positions = B.bloom_build(_keys_df(spark, ["a"]), "k", m_bits=64, k_hashes=2)
    probe = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "k string"
    )
    rows = B.bloom_might_contain(
        probe, "k", positions, m_bits=64, k_hashes=2
    ).collect()
    got = sorted((r["k"] or "<null>", r["might_contain"]) for r in rows)
    # duplicates keep multiplicity and share the flag; NULL flags false
    assert got.count(("a", True)) == 2
    assert ("<null>", False) in got
    assert len(rows) == 4


def test_exact_regime_is_exact_membership(spark):
    """Identity position map on a small integer domain: zero false
    positives by construction — bloom ≡ semi-join."""
    ins = spark.createDataFrame([(i % 61,) for i in range(0, 40, 3)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(61)], "k long")
    identity = lambda col, m, k: F.array(F.pmod(col, F.lit(m)))  # noqa: E731
    positions = B.bloom_build(ins, "k", m_bits=61, k_hashes=1, position_fn=identity)
    got = {
        r["k"]: r["might_contain"]
        for r in B.bloom_might_contain(
            probe, "k", positions, m_bits=61, k_hashes=1, position_fn=identity
        ).collect()
    }
    truth = {i % 61 for i in range(0, 40, 3)}
    assert all(got[i] == (i in truth) for i in range(61))


def test_cross_dedup_query_reconciles(spark, sf_dir):
    from storm_data_etl_spark.plans.ml_queries import bloom_cross_dedup

    out = bloom_cross_dedup(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["source"] not in ("src0", "src1")  # probes exclude inserted
        # no false negatives: flagged ⊇ exact duplicates
        assert r["n_flagged"] >= r["n_exact_dup"]
        assert r["n_false_pos"] == r["n_flagged"] - r["n_exact_dup"]
        assert 0 <= r["n_flagged"] <= r["n_docs"]


def test_misra_gries_estimate_regime_guarantees(spark):
    """Capacity BELOW the distinct-key count (the regime the oracle gate
    cannot certify): every estimate must undercount by at most n/(k+1),
    never overcount, and every key with true frequency > n/(k+1) must
    survive the trims (Misra & Gries 1982; mergeable form Agarwal et al.
    PODS 2012 §3.1)."""
    from storm_data_etl_spark.operators.heavy_hitters import misra_gries_summary

    # Skewed stream: key 0 → 600 rows, key 1 → 300, keys 2..41 → 10 each.
    rows = [(0,)] * 600 + [(1,)] * 300 + [(k, ) for k in range(2, 42) for _ in range(10)]
    df = spark.createDataFrame(rows, "hh_key bigint").repartition(8)
    n = len(rows)
    k = 4
    got = {
        r.hh_key: r.est_count
        for r in misra_gries_summary(df, "hh_key", k=k).collect()
    }
    true = {0: 600, 1: 300}
    assert len(got) <= k
    bound = n // (k + 1)
    for key, est in got.items():
        t = true.get(key, 10)
        assert est <= t, f"MG overcounted {key}: {est} > {t}"
        assert t - est <= bound, f"MG undercount bound broken for {key}"
    # Guaranteed survivors: true frequency > n/(k+1).
    for key, t in true.items():
        if t > bound:
            assert key in got, f"heavy key {key} evicted"


def test_misra_gries_exact_regime_is_exact(spark):
    from storm_data_etl_spark.operators.heavy_hitters import misra_gries_summary

    rows = [(i % 7,) for i in range(200)]
    df = spark.createDataFrame(rows, "hh_key bigint").repartition(5)
    got = {
        r.hh_key: r.est_count
        for r in misra_gries_summary(df, "hh_key", k=16).collect()
    }
    from collections import Counter

    assert got == dict(Counter(r[0] for r in rows))
