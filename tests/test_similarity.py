"""Tests for similarity search: brute-force exactness (vs numpy) and LSH recall."""

from __future__ import annotations

import math
import random

from storm_data_etl_spark.operators import similarity as S


def _vectors(n=50, dim=16, seed=3):
    rng = random.Random(seed)
    return [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]


def _cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_brute_force_topk_matches_numpy(spark):
    data = _vectors()
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [0, 1])
    got = S.brute_force_topk(df, probes, k=5).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append((r.rank, r.vec_id, r.cosine))

    vecs = dict(data)
    for pid in (0, 1):
        expected = sorted(
            ((i, _cosine(vecs[pid], v)) for i, v in data if i != pid),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        rows = sorted(by_probe[pid])
        assert [vid for _, vid, _ in rows] == [i for i, _ in expected]
        for (_, _, cg), (_, ce) in zip(rows, expected):
            assert abs(cg - ce) < 1e-6


def test_lsh_topk_recall(spark):
    data = _vectors(n=100, dim=16)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [0, 1, 2])
    exact = S.brute_force_topk(df, probes, k=5).collect()
    approx = S.lsh_bucketed_topk(df, probes, dim=16, k=5, n_planes=4).collect()
    exact_set = {(r.probe_id, r.vec_id) for r in exact}
    approx_set = {(r.probe_id, r.vec_id) for r in approx}
    # LSH with 4 planes keeps ~1/16 of candidates per bucket; recall over
    # the true top-5 should still be substantial on random data.
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"implausibly low LSH recall: {recall}"
    # approx results are a subset of legal pairs, correctly scored
    vecs = dict(data)
    for r in approx:
        assert abs(r.cosine - _cosine(vecs[r.probe_id], vecs[r.vec_id])) < 1e-6


def test_embedding_near_dup_pairs(spark):
    base = [1.0, 0.5, -0.25, 2.0]
    near = [x * 1.0001 for x in base]  # same direction → cosine ≈ 1
    far = [-1.0, 2.0, 0.5, -0.25]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<double>"
    )
    pairs = S.embedding_near_dup_pairs(df, dim=4, threshold=0.99, n_planes=4).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert pairs[0].cosine > 0.999


def test_ivf_topk_recall_and_determinism(spark):
    data = _vectors(n=100, dim=16)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [0, 1, 2])
    cents = S.train_ivf_centroids(df, dim=16, n_centroids=4, sample_n=64)
    # training is deterministic: same sample → same codebook
    assert cents == S.train_ivf_centroids(df, dim=16, n_centroids=4, sample_n=64)
    assert len(cents) == 4 and all(len(c) == 16 for c in cents)

    exact = S.brute_force_topk(df, probes, k=5).collect()
    approx = S.ivf_topk(df, probes, cents, k=5, n_probe=2).collect()
    exact_set = {(r.probe_id, r.vec_id) for r in exact}
    approx_set = {(r.probe_id, r.vec_id) for r in approx}
    # probing 2 of 4 cells scans ~half the table near the probe's region;
    # recall on random data should be substantial.
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"implausibly low IVF recall: {recall}"
    # scores on returned pairs are exact cosine
    vecs = dict(data)
    for r in approx:
        assert abs(r.cosine - _cosine(vecs[r.probe_id], vecs[r.vec_id])) < 1e-6


def test_ivf_full_probe_equals_brute_force(spark):
    """n_probe == n_centroids scans every cell → must equal the exact top-k."""
    data = _vectors(n=60, dim=8, seed=7)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [5, 6])
    cents = S.train_ivf_centroids(df, dim=8, n_centroids=3, sample_n=60)
    exact = {(r.probe_id, r.vec_id, r.rank) for r in S.brute_force_topk(df, probes, k=5).collect()}
    full = {(r.probe_id, r.vec_id, r.rank) for r in S.ivf_topk(df, probes, cents, k=5, n_probe=3).collect()}
    assert full == exact


def test_quantize_error_bounded_by_half_scale(spark, sf_dir):
    """int8 min-max quantization: worst-dim reconstruction error ≤ scale/2
    (the roundoff bound), and zero only for constant vectors."""
    from pyspark.sql import functions as F
    from storm_data_etl_spark.plans.ml_queries import embedding_quantize_error

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    half_scale_max = emb.select(
        ((F.array_max("v") - F.array_min("v")) / 255.0 / 2.0).alias("hs")
    ).agg(F.max("hs")).first()[0]
    out = embedding_quantize_error(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r.max_err_e6 <= int(1e6 * half_scale_max) + 1
        assert 0 <= r.avg_err_e6 <= r.max_err_e6


def test_pq_topk_recall_and_exact_rerank(spark):
    data = _vectors(n=100, dim=16)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [0, 1, 2])
    books = S.train_pq_codebooks(df, dim=16, m=4, k=8, sample_n=64)
    # training is deterministic, shapes are (m, k, dim/m)
    assert books == S.train_pq_codebooks(df, dim=16, m=4, k=8, sample_n=64)
    assert len(books) == 4 and all(len(b) == 8 and len(b[0]) == 4 for b in books)

    exact = S.brute_force_topk(df, probes, k=5).collect()
    approx = S.pq_topk(df, probes, books, k=5, rerank=32).collect()
    exact_set = {(r.probe_id, r.vec_id) for r in exact}
    approx_set = {(r.probe_id, r.vec_id) for r in approx}
    # re-ranking 32 ADC candidates out of 99 should recover most of top-5
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"implausibly low PQ recall: {recall}"
    # emitted scores are TRUE cosines (re-rank stage), only the candidate
    # choice is approximate
    vecs = dict(data)
    for r in approx:
        assert abs(r.cosine - _cosine(vecs[r.probe_id], vecs[r.vec_id])) < 1e-6


def test_pq_full_rerank_equals_brute_force(spark):
    """rerank ≥ N keeps every candidate → the exact-cosine re-rank stage
    must reproduce brute force identically, regardless of codebook quality."""
    data = _vectors(n=60, dim=8, seed=7)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [5, 6])
    books = S.train_pq_codebooks(df, dim=8, m=2, k=4, sample_n=60)
    exact = {(r.probe_id, r.vec_id, r.rank) for r in S.brute_force_topk(df, probes, k=5).collect()}
    full = {(r.probe_id, r.vec_id, r.rank) for r in S.pq_topk(df, probes, books, k=5, rerank=100).collect()}
    assert full == exact


def test_pq_rejects_indivisible_dim(spark):
    data = _vectors(n=10, dim=10)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        S.train_pq_codebooks(df, dim=10, m=4)


def test_training_sample_collect_is_capped(spark):
    """An oversized sample_n must raise BEFORE touching the cluster — the
    training sample is a driver collect(), so the cap is what stands
    between a careless caller and a driver OOM at 100 TB."""
    data = _vectors(n=4, dim=8)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="driver-safe"):
        S.train_ivf_centroids(df, dim=8, sample_n=S.MAX_TRAIN_SAMPLE + 1)
    with _pytest.raises(ValueError, match="driver-safe"):
        S.train_pq_codebooks(df, dim=8, m=2, sample_n=S.MAX_TRAIN_SAMPLE + 1)
    # at the cap itself, training proceeds (sample smaller than cap is fine)
    assert S.train_ivf_centroids(
        df, dim=8, n_centroids=2, sample_n=S.MAX_TRAIN_SAMPLE
    )


def test_ivfpq_topk_recall_and_full_scan_identity(spark):
    data = _vectors(n=100, dim=16)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    probes = S.make_probes(df, [0, 1, 2])
    cents = S.train_ivf_centroids(df, dim=16, n_centroids=4, sample_n=64)
    books = S.train_pq_codebooks(df, dim=16, m=4, k=8, sample_n=64)
    exact = S.brute_force_topk(df, probes, k=5).collect()
    approx = S.ivfpq_topk(df, probes, cents, books, k=5, n_probe=2, rerank=40).collect()
    exact_set = {(r.probe_id, r.vec_id) for r in exact}
    approx_set = {(r.probe_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"implausibly low IVF+PQ recall: {recall}"
    vecs = dict(data)
    for r in approx:
        assert abs(r.cosine - _cosine(vecs[r.probe_id], vecs[r.vec_id])) < 1e-6
    # probing every cell with full re-rank must equal brute force exactly
    full = {
        (r.probe_id, r.vec_id, r.rank)
        for r in S.ivfpq_topk(df, probes, cents, books, k=5, n_probe=4, rerank=100).collect()
    }
    assert full == {(r.probe_id, r.vec_id, r.rank) for r in exact}


def test_distributed_kmeans_properties(spark):
    """Distributed Lloyd training: right shape, distinct centroids,
    deterministic given integer-valued inputs (every partial sum exact →
    no summation-order noise), and full-probe search over its centroids is
    IDENTICAL to brute force (the property the gate certifies)."""
    random.seed(11)
    data = [
        (i, [float(random.randint(-8, 8)) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    cents = S.train_ivf_centroids_distributed(df, dim=8, n_centroids=4, iters=3)
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)
    assert len({tuple(c) for c in cents}) == 4  # distinct
    assert cents == S.train_ivf_centroids_distributed(
        df, dim=8, n_centroids=4, iters=3
    )
    probes = S.make_probes(df, [0, 1])
    exact = S.brute_force_topk(df, probes, k=5).collect()
    full = S.ivf_topk(df, probes, cents, k=5, n_probe=4).collect()
    assert [(r.probe_id, r.vec_id, r.rank) for r in full] == [
        (r.probe_id, r.vec_id, r.rank) for r in exact
    ]


def test_distributed_kmeans_matches_python_model(spark):
    """Exact parity with a pure-Python replica of the same algorithm on
    integer-valued vectors (exact float sums ⇒ order-independent): id-range
    bucket init, argmin assignment with lowest-index ties, mean update,
    farthest-point reseed."""
    data = [(i, [float((7 * i) % 5), float((3 * i) % 4)]) for i in range(12)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    k, iters = 3, 2
    got = S.train_ivf_centroids_distributed(df, dim=2, n_centroids=k, iters=iters)

    ids = [i for i, _ in data]
    vecs = {i: v for i, v in data}
    lo, hi = min(ids), max(ids)
    span = max(hi - lo + 1, 1)
    seeds: dict[int, int] = {}
    for i in sorted(ids):
        b = min((i - lo) * k // span, k - 1)
        seeds.setdefault(b, i)
    cent = [list(vecs[seeds[b]]) for b in sorted(seeds)]
    while len(cent) < k:
        cent.append(list(cent[0]))
    for _ in range(iters):
        assign: dict[int, int] = {}
        d2s: dict[int, float] = {}
        for i in ids:
            ds = [sum((a - b) ** 2 for a, b in zip(vecs[i], c)) for c in cent]
            assign[i] = ds.index(min(ds))
            d2s[i] = min(ds)
        new = []
        empties = []
        for c in range(k):
            members = [vecs[i] for i in ids if assign[i] == c]
            if members:
                new.append([sum(col) / len(members) for col in zip(*members)])
            else:
                new.append(None)
                empties.append(c)
        far = sorted(ids, key=lambda i: (-d2s[i], i))[: len(empties)]
        for c, i in zip(empties, far):
            new[c] = list(vecs[i])
        cent = new
    assert got == cent


def test_distributed_ivf_rejects_dim_mismatch(spark):
    """The declared dim is validated against the seed vectors instead of
    silently training on mismatched arrays."""
    import pytest

    from storm_data_etl_spark.operators.similarity import (
        train_ivf_centroids_distributed,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dim=3"):
        train_ivf_centroids_distributed(vecs, dim=3, n_centroids=2, iters=1)
    # correct dim still trains
    cents = train_ivf_centroids_distributed(vecs, dim=2, n_centroids=2, iters=1)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)


def test_hard_negatives_are_wrong_class_and_ranked(spark, sf_dir):
    """Every mined negative carries a label different from its probe's;
    ranks are dense 1..5 per probe with cosine non-increasing."""
    from storm_data_etl_spark.plans.ml_queries import hard_negative_mining

    rows = hard_negative_mining(spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        assert r["neg_label"] != r["probe_label"]
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert len(by_probe) == 8
    for recs in by_probe.values():
        recs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in recs] == list(range(1, len(recs) + 1))
        cosines = [r["cosine"] for r in recs]
        assert cosines == sorted(cosines, reverse=True)


def test_maxsim_degenerates_to_dot_for_identical_tokens(spark, tmp_path):
    """If all 4 token slices of a doc equal the query's, MaxSim = 4 * max
    dot; a handcrafted best-match doc must rank 1."""
    import numpy as np

    from storm_data_etl_spark.plans import ml_queries as MQ

    rng = np.random.RandomState(7)
    rows = []
    # probe 0; doc 3 is an exact copy (best possible MaxSim). Vectors are
    # CENTERED so cross-dots concentrate near 0 while the copy's self-dot
    # is the full squared norm — with raw [0,1) values a large-norm noise
    # doc can legitimately out-dot the copy (dot is not cosine).
    base = (rng.rand(64) - 0.5).astype("float32")
    rows.append((0, base.tolist(), 0))
    rows.append((3, base.tolist(), 0))
    for i in range(4, 24):
        rows.append((i, (rng.rand(64) - 0.5).astype("float32").tolist(), 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = [r for r in MQ.maxsim_late_interaction_topk(spark, str(tmp_path)).collect()
           if r.probe_id == 0]
    assert out and min(out, key=lambda r: r.rank).vec_id == 3


def test_matryoshka_full_dim_recall_is_one(spark, sf_dir):
    """The 64-dim leg is its own baseline -> recall exactly 10000 e4;
    truncated dims stay in [0, 10000]."""
    from storm_data_etl_spark.plans import ml_queries as MQ

    out = {r.dim: r for r in
           MQ.matryoshka_truncation_recall(spark, sf_dir).collect()}
    assert out[64].recall_e4 == 10000
    for d in (8, 16, 32):
        assert 0 <= out[d].recall_e4 <= 10000
    assert all(r.n_probes == 5 for r in out.values())


def test_kmeans_assign_tiebreak_and_inertia(spark, tmp_path):
    """Equidistant point goes to the LOWER centroid id; inertia equals the
    per-row-quantized Python sum."""
    import math

    from storm_data_etl_spark.plans import ml_queries as MQ

    dim = 64
    def vec(x):  # constant vector
        return [float(x)] * dim

    rows = [
        (0, vec(0.0), 0),     # centroid A (0 % 61 == 0)
        (61, vec(10.0), 0),   # centroid B
        (1, vec(2.0), 0),     # closer to A
        (2, vec(5.0), 0),     # EQUIDISTANT -> tie-break to cid 0
        (3, vec(9.0), 0),     # closer to B
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r.cluster_id: r for r in
           MQ.kmeans_assign_fixed_centroids(spark, str(tmp_path)).collect()}
    assert out[0].n_members == 3   # centroid 0 itself + point 1 + tied point 2
    assert out[61].n_members == 2  # centroid 61 itself + point 3
    # python replica of inertia_e6 for cluster 0: d2 = dim * delta^2
    exp0 = sum(math.floor(1e6 * (dim * d * d)) for d in (0.0, 2.0, 5.0))
    assert out[0].inertia_e6 == exp0
