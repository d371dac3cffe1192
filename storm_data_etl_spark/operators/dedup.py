"""Deduplication operators for large-scale training-data pipelines.

Five families, ordered by cost:

1. exact        — hash-groupBy on a content fingerprint (one shuffle)
2. ngram-jaccard— exact set similarity via shingle inverted index (shuffle on
                  shingle, then on pair) — exact but quadratic in bucket size
3. MinHash+LSH  — signature → bands → bucket join; near-linear, probabilistic
4. SimHash      — 64-bit sketch + banded Hamming candidates; cheapest sketch
5. embedding    — cosine near-dup over vectors (see operators.similarity)

All are built from DataFrame ops + higher-order functions — no Python UDFs.
At 100 TB: every family shuffles on a derived key (fingerprint / shingle /
band hash), which distributes uniformly by construction (hashes), so no skew
salting is needed except for pathological repeated documents — exactly the
rows dedup removes first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.session import pin as _pin

# Deterministic MinHash parameters (fixed seed → reproducible signatures).
# 31-bit hash space: a*x + b stays < 2^62, safe under ANSI-mode long
# arithmetic (no overflow), while 2^31 slots are ample for shingle minima.
_MERSENNE_P = (1 << 31) - 1


def _minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a, b) pairs for the universal hash family h(x) = (a*x + b) mod p.
    Derived from a fixed LCG so signatures are stable across runs/engines."""
    coeffs = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        coeffs.append((a, b))
    return coeffs


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact near-whitespace dedup: fingerprint = md5(normalized text),
    keep the lowest-id row per fingerprint (first-wins under a total order,
    same D1 window pattern as the reference's by-ID dedup).

    Returns the input columns + `fingerprint` + `dup_count` (group size).
    One shuffle on the fingerprint; group sizes are tiny by construction.
    """
    fp = df.withColumn("fingerprint", X.fingerprint(text_col))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("fingerprint")))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via a shingle inverted index.

    Plan shape: explode shingles → self-join on shingle (only pairs that
    share ≥1 shingle are candidates) → count common shingles per pair →
    jaccard = common / (|A| + |B| - common) → filter ≥ threshold.

    Exact (no sketch error) but O(Σ bucket²) in the worst case — the scale
    path for fuzzy dedup is `minhash_lsh_pairs`; this one doubles as its
    verification oracle. Output: (id_a, id_b, jaccard) with id_a < id_b.

    Plan shape (optimization r13, guide §2.4): shingling (regex + higher-
    order array ops, the expensive narrow pass) runs ONCE into a pinned
    per-doc ARRAY of 8-byte xxhash64 shingle hashes — sizes are in-row
    `size(harr)` (the old per-id count aggregate and its exchange are
    deleted), and the exploded (id, shingle) relation is pinned PRE-
    PARTITIONED on the shingle hash, so the self-join reads both sides
    co-partitioned from cache with ZERO join exchanges (both consumers
    project identical columns — the case where cached partitioning is
    preserved; cf. the pagerank invariant pins). The only corpus-scale
    exchange left is the unavoidable candidate-pair aggregate. Hash
    collision probability stays ~1e-19 per pair (same key as before —
    counts unaffected); duplicate hashes inside one doc's array are kept
    (transform, not array_distinct), so row multisets are bit-identical
    to the exploded form.
    """
    base = _pin(
        df.select(
            F.col(id_col).alias("id"),
            F.transform(X.shingles(text_col, k), lambda s: F.xxhash64(s)).alias(
                "harr"
            ),
        )
    )
    sh = base.select("id", F.explode("harr").alias("shingle"))
    sh = _pin(sh.repartition("shingle"))
    sizes = base.select("id", F.size("harr").cast("long").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def jaccard_prefix_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs — the PPJoin-style scale path.

    `ngram_jaccard_pairs` indexes EVERY shingle, so candidate volume is
    Σ bucket² over all shingles; common shingles ("the data") generate
    almost all of those pairs while confirming almost none. The prefix
    filter exploits a total order over shingles (rarest first, by global
    document frequency): if J(A,B) ≥ t, the two sets MUST share a shingle
    among each one's first |S| - ⌈t·|S|⌉ + 1 shingles in that order — so
    only those prefix shingles need indexing. Rare shingles have tiny
    buckets, so candidate volume collapses while recall stays exact; the
    surviving candidates are verified with a full intersection count,
    making the output identical to the all-pairs operator (the unit tests
    and the shared oracle pin that equivalence).

    Plan shape (round 9, the bench-on-land drain's first plan fix): shingle
    pass persisted once; global frequency table joined back (shuffle on
    shingle hash — uniform); per-doc rank window (shuffle on id); candidate
    self-join over prefix shingles ONLY, with PPJoin's two exact
    candidate-side prunes evaluated inside the join probe (Xiao et al.
    2008 §3): the LENGTH filter (J ≥ t ⇒ t·|B| ≤ |A|) and the POSITIONAL
    filter (at the first common prefix shingle at ranks (i, j), overlap ≤
    1 + min(|A|−i, |B|−j), which must reach ⌈t/(1+t)·(|A|+|B|)⌉ — valid
    because the first common element of two t-similar sets provably sits
    inside both prefixes). Verification then joins the surviving pairs to
    the PER-DOCUMENT shingle-array table (one row per doc — broadcastable
    at dim scale, doc-keyed shuffle at corpus scale) and intersects in
    whole-stage codegen, instead of re-exploding pair × shingle rows
    (which was 70% of the runtime at sf0.1: 6.5 s → the shingle-level
    verify re-shuffled ~|pairs|·|A| rows). Prefix length uses
    n - floor(t·n) + 1 — one longer than strictly needed — and both
    filters subtract 1e-9 before comparing, so float edge cases can only
    admit extra candidates (cost), never miss one (correctness).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(X.shingles(text_col, k)).alias("s"),
    ).select("id", F.xxhash64("s").alias("shingle"))
    sh = _pin(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s"))
    prefix_len = F.col("n_shingles") - F.floor(threshold * F.col("n_shingles")) + 1
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df_s", "shingle")
            ),
        )
        .join(sizes, "id")
        .filter(F.col("rn") <= prefix_len)
        .select("id", "shingle", "rn", F.col("n_shingles").alias("n"))
    )
    # the self-join consumes ranked twice — pin so the freq join + rank
    # window execute once, not per join side
    ranked = _pin(ranked)
    eps = 1e-9
    alpha = threshold / (1.0 + threshold)  # overlap ≥ α·(|A|+|B|)
    cand = (
        ranked.alias("a")
        .join(
            ranked.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: t·max ≤ min is necessary for J ≥ t
            & (F.col("a.n") >= threshold * F.col("b.n") - eps)
            & (F.col("b.n") >= threshold * F.col("a.n") - eps)
            # positional filter: overlap upper bound at this match
            & (
                1 + F.least(F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn"))
                >= alpha * (F.col("a.n") + F.col("b.n")) - eps
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Doc-level verify table: shingles are distinct per doc (X.shingles),
    # so |array_intersect| == the exact common-shingle count.
    arrs = sh.groupBy("id").agg(
        F.collect_list("shingle").alias("shs"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrs.select(
        F.col("id").alias("id_a"), F.col("shs").alias("shs_a"), F.col("n").alias("n_a")
    )
    bb = arrs.select(
        F.col("id").alias("id_b"), F.col("shs").alias("shs_b"), F.col("n").alias("n_b")
    )
    jac = (
        cand.join(aa, "id_a")
        .join(bb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("shs_a", "shs_b")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: C = |A∩B| / min(|A|, |B|).

    Jaccard under-scores subset relationships — a paragraph wholly embedded
    in a much longer page has J = |A|/|B| ≈ 0 but containment ≈ 1. Corpus
    curation cares about exactly that case (quoted/boilerplate inclusion,
    doc-in-doc scrapes), so the standard recipe (e.g. Broder's shingling
    paper's "containment" measure) is max-containment over the smaller set.

    Same inverted-index plan shape as `ngram_jaccard_pairs` (one persisted
    shingle pass, self-join on 8-byte shingle hash, per-pair intersection
    count, size join) — only the final scoring expression differs, so the
    scale analysis there applies unchanged. Output (id_a, id_b, containment)
    with id_a < id_b, containment rounded to 6 places.
    """
    base = _pin(
        df.select(
            F.col(id_col).alias("id"),
            F.transform(X.shingles(text_col, k), lambda s: F.xxhash64(s)).alias(
                "harr"
            ),
        )
    )
    sh = base.select("id", F.explode("harr").alias("shingle"))
    sh = _pin(sh.repartition("shingle"))
    sizes = base.select("id", F.size("harr").cast("long").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    cont = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", F.col("n_common") / F.least("n_a", "n_b"))
        .filter(F.col("containment") >= threshold)
    )
    return cont.select("id_a", "id_b", F.round("containment", 6).alias("containment"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures: for each of ``num_hashes`` universal hash
    functions, the min over the document's shingle hashes.

    Shingle base hash is xxhash64 (JVM built-in, one narrow pass). The
    num_hashes permutation minima run in a numpy Pandas UDF — the documented
    exception to the zero-UDF rule: the pure higher-order-function
    formulation (num_hashes array passes per document) evaluates
    interpreted, ~num_hashes× slower than one vectorized
    (a·H + b) mod p matrix op per Arrow batch. Signatures are bit-identical
    between the two formulations (same integer arithmetic).
    Output: (id, signature array<long>).
    """
    coeffs = _minhash_coeffs(num_hashes, seed)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]

    sh = df.select(F.col(id_col).alias("id"), X.shingles(text_col, k).alias("shingles"))
    # A document with NO shingles (null text) has no signature at all —
    # the sentinel all-P signature would band every such doc into one
    # bucket and the verify stage would divide 0/0. Matches exact-Jaccard
    # semantics: the empty set is similar to nothing.
    sh = sh.filter(F.size("shingles") > 0)
    hashed = sh.withColumn(
        "hashes", F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    )

    @F.pandas_udf("array<long>")
    def _signature(batch: pd.Series) -> pd.Series:
        out = []
        for hs in batch:
            if len(hs) == 0:
                out.append([int(_MERSENNE_P)] * num_hashes)
                continue
            # numpy % with a positive modulus matches Spark's pmod, so the
            # 31-bit reduction of the raw xxhash64 folds into this op;
            # reduced values < 2^31 and a < 2^31 → products < 2^62.
            h = np.asarray(hs, dtype=np.int64) % _MERSENNE_P
            mins = ((h[None, :] * a_vec + b_vec) % _MERSENNE_P).min(axis=1)
            out.append(mins.tolist())
        return pd.Series(out)

    return hashed.select("id", _signature(F.col("hashes")).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs with estimated Jaccard.

    rows_per_band = num_hashes/bands; two docs land in the same bucket when
    one band of their signatures agrees exactly — P(candidate) ≈
    1-(1-j^r)^b, tuned so j≥threshold is caught w.h.p. Estimated Jaccard =
    fraction of agreeing signature positions; pairs below threshold are
    dropped after estimation.

    Scale shape: explode to ``bands`` rows/doc, shuffle on (band, hash) —
    uniform keys — then per-bucket pairing. Never compares documents that
    share no band. Output: (id_a, id_b, est_jaccard).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # Persist the signatures: computing them is the expensive narrow pass
    # (shingling + num_hashes permutations); the banded self-join would
    # otherwise recompute it for both sides.
    sig = _pin(minhash_signatures(df, text_col, id_col, num_hashes, k, seed))
    return _banded_signature_pairs(sig, bands, r, num_hashes, threshold)


def _banded_signature_pairs(
    sig: DataFrame, bands: int, r: int, sig_len: int, threshold: float
) -> DataFrame:
    """Shared LSH banding over a (id, signature array<long>) frame: explode
    to bands keyed by the band slice's hash, equi-join same (band, bucket),
    estimate similarity as the fraction of agreeing signature positions.
    Used by both classic MinHash and one-permutation (OPH) signatures —
    the banding math is identical; only signature construction differs."""
    banded = sig.select(
        "id",
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.array_join(F.slice(F.col("signature"), i * r + 1, r), ",")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "signature", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(sig_len))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def oph_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bins: int = 64,
    k: int = 3,
) -> DataFrame:
    """One-permutation MinHash (OPH) signatures with rotation densification
    (Li/Owen/Zhang one-permutation hashing + Shrivastava's densified
    variant): hash every shingle ONCE, scatter by `hash % num_bins`, keep
    the min per bin, and fill empty bins by borrowing circularly from the
    next non-empty bin with an offset tag (so borrowed positions only
    collide with positions that borrowed the same way).

    Why it exists: classic MinHash evaluates `num_hashes` permutations
    per shingle; OPH gets the same signature LENGTH (so the SAME banding
    plan) from one hash per shingle, and its per-position collision
    probability is still ≈ Jaccard, so banding thresholds carry over.
    Honest measurement (40k docs, local[16]): this engine's classic path
    is ALREADY a vectorized numpy matrix op, so OPH lands within 3% of it
    (10.4s vs 10.7s; the shingle+Arrow pass is 5.0s of both) — the win
    materializes where the permutation count cannot be amortized by
    vectorization (per-row JVM/driver implementations, much larger
    num_hashes, memory-bandwidth-bound executors), not here. Included for
    algorithmic completeness with recall pinned vs classic MinHash and vs
    exact Jaccard in pytest.

    Same vectorized-pandas_udf exception as minhash_signatures, same
    reasons. Output: (id, signature array<long>).
    """
    sh = df.select(F.col(id_col).alias("id"), X.shingles(text_col, k).alias("shingles"))
    sh = sh.filter(F.size("shingles") > 0)
    hashed = sh.withColumn(
        "hashes", F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    )
    _EMPTY = np.int64(np.iinfo(np.int64).max)
    # Offset constant for densification: large, odd, and reduced mod p so
    # borrowed values stay in-range and distinct borrow distances differ.
    _C = np.int64(2654435761 % _MERSENNE_P)

    @F.pandas_udf("array<long>")
    def _signature(batch: pd.Series) -> pd.Series:
        out = []
        for hs in batch:
            h = np.asarray(hs, dtype=np.int64) % _MERSENNE_P
            bins = (h % num_bins).astype(np.int64)
            sig = np.full(num_bins, _EMPTY, dtype=np.int64)
            np.minimum.at(sig, bins, h)
            empty = sig == _EMPTY
            if empty.any() and not empty.all():
                # rotation densification: borrow from the next non-empty
                # bin to the right (circular), offset by borrow distance
                filled = np.where(~empty)[0]
                for i in np.where(empty)[0]:
                    # distance to the next filled bin, circularly
                    d = (filled - i) % num_bins
                    j = filled[np.argmin(d)]
                    dist = (j - i) % num_bins
                    sig[i] = (sig[j] + dist * _C) % _MERSENNE_P
            out.append(sig.tolist())
        return pd.Series(out)

    return hashed.select("id", _signature("hashes").alias("signature"))


def oph_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bins: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH banding over OPH signatures — the cheap-signature scale path:
    identical banding plan to minhash_lsh_pairs (same helper), signature
    pass costs ONE hash per shingle instead of num_hashes. Output:
    (id_a, id_b, est_jaccard)."""
    if num_bins % bands:
        raise ValueError("bands must divide num_bins")
    sig = _pin(oph_signatures(df, text_col, id_col, num_bins, k))
    return _banded_signature_pairs(sig, bands, num_bins // bands, num_bins, threshold)


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Candidate-generate + exact-verify near-dup pairs: MinHash+LSH prunes
    the pair space, then the surviving candidates are verified with the
    EXACT shingle Jaccard. Output: (id_a, id_b, jaccard) with
    jaccard ≥ threshold — identical to the all-pairs exact operator whenever
    LSH recall at the threshold is 1, which banding guarantees w.h.p.
    (P(miss) = (1-j^r)^b; at j=0.9, r=4, b=16 that is ~4e-8 per pair).

    This is the standard production shape for fuzzy dedup (candidates from
    the sketch, exactness from verification): the expensive exact measure
    runs only on O(candidates), not O(N²), so the plan scales like LSH while
    the output contract is the exact one — and is therefore SQL-oracle-able.
    """
    cand = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, bands, k, threshold=0.0, seed=seed
    ).select("id_a", "id_b")
    return _exact_verify_pairs(df, cand, text_col, id_col, k, threshold)


def _exact_verify_pairs(
    df: DataFrame,
    cand: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair list — the shared
    verify stage of every sketch-based dedup path (MinHash, OPH)."""
    ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    # Restrict BEFORE the shingle projection: Catalyst does not push a
    # LeftSemi below a Project, so joining first is what keeps the
    # expensive shingle computation to candidate docs only. Persist: the
    # small candidate shingle set feeds both sides of the pair join.
    docs_cand = df.join(
        ids, df[id_col] == ids["id"], "semi"
    )
    sh = docs_cand.select(
        F.col(id_col).alias("id"), X.shingles(text_col, k).alias("sh")
    )
    sh = _pin(sh)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union_n = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union_n
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def oph_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bins: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """OPH candidates + exact-Jaccard verify: same output contract as
    minhash_verified_pairs (≡ the all-pairs exact operator at recall 1)
    with the one-hash-per-shingle signature pass — the cheapest
    SQL-oracle-able fuzzy-dedup path in the engine."""
    cand = oph_lsh_pairs(
        df, text_col, id_col, num_bins, bands, k, threshold=0.0
    ).select("id_a", "id_b")
    return _exact_verify_pairs(df, cand, text_col, id_col, k, threshold)


def connected_components(
    pairs: DataFrame, max_iter: int = 25, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Connected components over an undirected pair list: every node gets
    ``component`` = the minimum id reachable from it. This closes the gap
    `dedup_by_pairs` documents — chained near-dup clusters (A~B, B~C, A≁C)
    collapse to one representative instead of leaking one doc per missing
    edge.

    Algorithm: iterative min-label propagation (label := min(label,
    neighbors' labels)) until a fixpoint, detected by the strictly
    decreasing sum of labels. Converges in O(graph diameter) rounds; dedup
    graphs are near-cliques, so 2-3 rounds in practice. Each round is one
    shuffle-join on uniformly distributed ids; `localCheckpoint` cuts the
    growing lineage so round N doesn't recompute rounds 1..N-1. At extreme
    scale the two-phase large-star/small-star formulation (O(log n) rounds
    on high-diameter graphs) drops in behind the same signature.

    Output: (id, component) for every id appearing in ``pairs``; callers
    left-join singletons back with component = own id.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nlabel")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlabel").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def _edge_signature(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive fingerprint of an edge set (count, hash-sum)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: commutative, associative, overflow-free under ANSI mode
        # (a hash-SUM would throw ARITHMETIC_OVERFLOW on 64-bit hashes)
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components_star(
    pairs: DataFrame, max_iter: int = 30, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    O(log n)-round formulation that `connected_components`' min-label
    propagation (O(diameter) rounds) needs behind it for adversarial
    high-diameter graphs at 100 TB scale.

    One round = two grouped passes over the edge list:
      large-star: every node links its LARGER neighbors to the smallest
        member of its neighborhood (incl. itself) — long chains contract
        toward minima in parallel;
      small-star: every node links its smaller-or-equal neighbors to that
        minimum — stars flatten.
    The edge set converges to a star forest: (node → component minimum).
    Each pass is one shuffle on node id (uniform keys); `localCheckpoint`
    cuts lineage per round; convergence is an O(1)-state fingerprint
    compare, not a join-and-diff.

    Output: (id, component) for every id in ``pairs`` — identical contract
    (and, by the equivalence tests, identical output) to
    `connected_components`.
    """
    def sym(e: DataFrame) -> DataFrame:
        return (
            e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def with_min(e: DataFrame) -> DataFrame:
        # (u, v, m) rows where m = min(Γ(u) ∪ {u}); e is symmetric so the
        # grouped min sees every adjacency.
        m = (
            e.groupBy("src")
            .agg(F.min("dst").alias("_nmin"))
            .select(
                F.col("src").alias("u"),
                F.least(F.col("_nmin"), F.col("src")).alias("m"),
            )
        )
        return e.join(m, e["src"] == m["u"], "inner").select(
            F.col("src").alias("u"), F.col("dst").alias("v"), "m"
        )

    edges = sym(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("id")).distinct().localCheckpoint()
    sig = _edge_signature(edges)
    for _ in range(max_iter):
        # large-star: every strictly-larger neighbor of u links to m(u)
        wm = with_min(edges)
        large = wm.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        )
        edges = sym(large).localCheckpoint()
        # small-star: every smaller neighbor of u (and u itself) links to m(u)
        wm = with_min(edges)
        small = wm.filter(F.col("v") < F.col("u")).select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        )
        own = wm.select(F.col("u").alias("src"), F.col("m").alias("dst")).distinct()
        edges = sym(small.union(own)).localCheckpoint()
        new_sig = _edge_signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    # Star forest: each node's component is its minimum neighbor, or itself
    # for roots; nodes whose component collapsed onto them keep themselves.
    comp = (
        nodes.join(edges, nodes["id"] == edges["src"], "left")
        .groupBy("id")
        .agg(F.min("dst").alias("_m"))
        .select(
            "id",
            F.least(F.coalesce(F.col("_m"), F.col("id")), F.col("id")).alias("component"),
        )
    )
    return comp


def dedup_by_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop near-duplicates given a pair list: every id_b that appears with
    some id_a < id_b is removed (min-id representative survives).

    Single-pass approximation of connected components — exact for clusters
    whose members all pair with the minimum element (the common case at high
    thresholds); chained clusters keep one extra doc per missing edge, which
    is the standard trade-off in one-pass large-scale dedup.
    """
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, on=id_col, how="left_anti")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash sketch: sign-sum of per-token xxhash64 bits → packed bigint.

    For each bit position i: sum over tokens of (+1 if bit set else -1);
    sketch bit i = (sum > 0). Near-identical token multisets differ in few
    bits (small Hamming distance).

    Token hashing stays JVM-side (xxhash64); the 64 bit-votes run in a
    numpy Pandas UDF (same rationale and determinism argument as
    minhash_signatures — 64 interpreted aggregate passes collapse into one
    vectorized bit-matrix op). Output: (id, simhash long).
    """
    if bits != 64:
        raise ValueError("simhash is defined for 64-bit sketches")
    tk = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            X.tokens(X.normalize_for_fingerprint(text_col)), lambda w: F.xxhash64(w)
        ).alias("h"),
    )
    # NULL text → NULL token array; the numpy kernel cannot take None and,
    # as with minhash, a shared empty-sketch would pair every null doc with
    # every other. No tokens → no sketch.
    tk = tk.filter(F.col("h").isNotNull() & (F.size("h") > 0))

    @F.pandas_udf("long")
    def _pack(batch: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for hs in batch:
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            if h.size == 0:
                out.append(0)
                continue
            votes = (((h[:, None] >> shifts) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
            packed = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                packed |= np.uint64(1) << np.uint64(i)
            out.append(int(packed.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return tk.select("id", _pack(F.col("h")).alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates via banded exact-match (pigeonhole: pairs
    within ``max_hamming`` < bands share at least one identical 16-bit band).
    Output: (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    width = 64 // bands
    sh = _pin(simhash(df, text_col, id_col))  # sketch once, join twice
    mask = (1 << width) - 1
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        # logical (unsigned) shift: sign-extension would
                        # corrupt the top band's chunk for negative sketches
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# =====================================================================
# Sorted-neighborhood blocking (family 6)
# =====================================================================

def global_rank(df: DataFrame, order_cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Scalable global row_number over `order_cols` (must be a unique key).

    A bare `Window.orderBy(...)` pulls the whole table into ONE task — the
    textbook non-scalable plan. This is the two-phase form: range-partition
    on the order columns (cluster-wide sort boundaries), rank WITHIN each
    partition, then add per-partition row-count offsets via a broadcast
    join (one row per partition). Total cost: one range shuffle + one tiny
    count job; every stage is parallel.

    Range-partition sampling is seeded deterministically (RangePartitioner
    sketches with a byteswap32(partitionId) seed), so re-evaluating the
    same lineage yields the same bounds and ranks.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    part = part.withColumn("_rn", F.row_number().over(w))
    # MUST pin one materialization: the per-partition counts and the joined
    # rows both re-evaluate `part` otherwise, and AQE may coalesce the two
    # range shuffles differently — _pid labels then disagree between the
    # offset table and the rows, scrambling the global ranks (observed at
    # sf0.1 as a nondeterministic sorted-neighborhood pair set). The pin
    # must outlive the caller's terminal action, so the CALLER inherits a
    # live cache; long-lived sessions free it via session.release_pinned().
    part = _pin(part)
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # ~num_partitions rows: a single-task window here is fine by design.
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0))
    ).select("_pid", "_off")
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn("rnk", F.col("_off") + F.col("_rn"))
        .drop("_pid", "_rn", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 24,
    window: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """Sorted-neighborhood near-dup detection: sort the corpus by a content
    prefix key, compare each doc only to its next `window` neighbors in the
    global sort order, verify with exact word-set Jaccard ≥ threshold.

    The classic record-linkage alternative to LSH blocking (Hernández &
    Stolfo's merge/purge): O(n·w) comparisons after an O(n log n) sort,
    strong at catching duplicates with shared prefixes (boilerplate
    headers, templated docs) that token-sampling sketches can miss.
    Complements the reference's exact first-wins dedup (SURVEY §2.6 D1,
    internal/transform/dedupe.go) with a fuzzy variant.

    Plan shape: one range shuffle (the sort) → rank → the "next w" pairing
    is an EQUI-join on rank (left side explodes w offsets, so candidate
    volume is exactly n·w rows — never a non-equi nested loop). Jaccard is
    verified inline from the carried distinct-word arrays (array_intersect,
    JVM-side), no second pass over the corpus.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    """
    norm = X.normalize_for_fingerprint(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.substring(norm, 1, prefix_len).alias("skey"),
        F.array_distinct(F.split(norm, " ")).alias("words"),
    )
    # No second persist here: global_rank already pins its partitioned frame,
    # so the left/right re-reads only recompute the cheap window+offset join
    # over that cache (a stacked persist of overlapping lineage doubles the
    # memory for no replanning benefit).
    ranked = global_rank(base, ["skey", "id"])
    left = ranked.select(
        F.col("id").alias("ia"),
        F.col("words").alias("wa"),
        F.col("rnk"),
        F.explode(F.array(*[F.lit(o) for o in range(1, window + 1)])).alias("o"),
    ).select("ia", "wa", (F.col("rnk") + F.col("o")).alias("nrnk"))
    right = ranked.select(
        F.col("id").alias("ib"), F.col("words").alias("wb"), F.col("rnk")
    )
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    union = F.size(F.col("wa")) + F.size(F.col("wb")) - inter
    j = inter.cast("double") / union
    return (
        left.join(right, left.nrnk == right.rnk)
        .withColumn("j", j)
        .filter(F.col("j") >= threshold)
        .select(
            F.least(F.col("ia"), F.col("ib")).alias("id_a"),
            F.greatest(F.col("ia"), F.col("ib")).alias("id_b"),
            F.round(F.col("j"), 6).alias("jaccard"),
        )
    )


def substring_dup_spans(
    docs: DataFrame,
    gram_len: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring detection, the practical core of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" — public literature): a character
    position is duplicated when the ``gram_len``-gram starting there occurs
    ≥ 2 times anywhere in the corpus. Emits, per document, the count of
    duplicated start positions and the character coverage of the merged
    duplicated spans [pos, pos+gram_len) — exactly the "how much of this
    doc is copied text" number a cut-the-substring policy needs.

    Spark-first shape (vs the paper's monolithic suffix array, which does
    not distribute): every char position becomes an L-gram row (JVM
    sequence/explode/substring — linear in corpus characters, the same
    I/O a suffix-array build pays), duplication is ONE count aggregate
    shuffled on the gram, the positions of duplicated grams come back via
    a semi join on the same key (shuffle reuse), and span merging is the
    standard running-max interval union windowed per document. No
    all-pairs stage anywhere; the gram keys are near-uniform (natural
    text), so no hot key. For corpora where grams exceed memory budgets,
    group on xxhash64(gram) first and verify the rare collisions — the
    string-key form here is the oracle-exact variant."""
    n_pos = F.length(text_col) - gram_len + 1
    grams = docs.select(
        F.col(id_col),
        # sequence(1, 0) would generate a DESCENDING [1, 0]; docs shorter
        # than one gram must contribute no rows (explode drops the null)
        F.explode(
            F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos))
        ).alias("pos"),
        F.col(text_col),
    ).select(
        id_col, "pos", F.expr(f"substring({text_col}, pos, {gram_len})").alias("gram")
    )
    # (Optimization r12 note: a gram-keyed window count was measured here
    # and was a wash at sf0.1 (1.05 -> 1.02 s) while forcing a full
    # sort-shuffle of every position row; the aggregate + semi-join keeps
    # map-side partial combining.)
    # Optimization r12 (guide §2.4): grams feeds BOTH the occurrence
    # aggregate and the semi-join probe — two lineage references that
    # each re-ran the position explode + substring pass (an explicit
    # shared repartition was measured first and REGRESSED: column pruning
    # gives the consumers different exchange subtrees, ReuseExchange
    # never fires, and the repartition added a gram-string shuffle the
    # broadcast semi join never needed). Pinning runs the explode once;
    # the probe keeps its zero-shuffle broadcast join.
    grams = _pin(grams)
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("gram")
    )
    dup_pos = grams.join(dup_grams, "gram", "left_semi").select(id_col, "pos")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = dup_pos.withColumn("prev_max_end", F.max(F.col("pos") + gram_len).over(w))
    covered = spans.select(
        F.col(id_col),
        F.when(
            F.col("prev_max_end").isNull(), F.lit(gram_len)
        )
        .otherwise(
            F.greatest(
                F.col("pos") + gram_len - F.greatest(F.col("prev_max_end"), F.col("pos")),
                F.lit(0),
            )
        )
        .alias("new_cover"),
    )
    per_doc = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_positions"),
        F.sum("new_cover").alias("dup_coverage_chars"),
    )
    base = docs.select(id_col, F.length(text_col).alias("n_chars"))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_chars",
        F.coalesce("n_dup_positions", F.lit(0)).alias("n_dup_positions"),
        F.coalesce("dup_coverage_chars", F.lit(0)).alias("dup_coverage_chars"),
    )


def dup_length_bracket(
    docs: DataFrame,
    lengths: tuple[int, ...] = (16, 32, 64, 128),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Largest duplicated-substring length bracket per document: for each
    L in ``lengths``, a doc "hits" L when ANY of its L-grams occurs ≥ 2
    times in the corpus; emitted is the max hitting L (0 = no bracket
    hit). The doubling-bracket answer to "how LONG is the longest copied
    span?" that suffix arrays give exactly — dup-gram presence is monotone
    decreasing in L, so the bracket brackets the true maximum, at the cost
    of one linear gram pass per length instead of a monolithic
    (non-distributable) suffix array. Each pass is the proven
    substring_dup_spans plan shape: gram explosion, count aggregate and
    semi join keyed on the gram, then a distinct per doc.
    """
    # Optimization r12 (guide §2.3/§2.4): the four per-L passes each ran the
    # gram explode TWICE (count aggregate + semi-join back) — 8 corpus
    # passes and ~3 exchanges per L. Now ONE explode over the L_min
    # position range emits every valid (L, gram) entry as an 8-byte
    # xxhash64 FINGERPRINT (guide §2.3 "shuffle keys and metadata instead
    # of payloads" — up-to-128-char gram strings never cross the wire),
    # ONE (L, fp)-keyed window count finds duplicated fingerprints in a
    # single pass (one narrow exchange, sort over 8-byte keys), and the
    # surviving candidates are VERIFIED on the real gram text (the
    # exact_substr_cut_tokens discipline: every occurrence of a flagged
    # fingerprint is a candidate, so recounting the materialized grams
    # over candidates yields the true per-gram count — a hash collision
    # can only add a verified-away candidate, never a wrong bracket).
    # Exact at every scale; same counts, same rows.
    lmin = min(lengths)
    n = F.length(text_col)
    pos_df = docs.select(
        F.col(id_col),
        F.col(text_col),
        n.alias("_n"),
        F.explode(
            F.when(n >= lmin, F.sequence(F.lit(1), n - lmin + 1))
        ).alias("pos"),
    )
    entries = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(L).alias("L"),
                    F.when(
                        F.col("pos") <= F.col("_n") - L + 1,
                        F.xxhash64(F.expr(f"substring({text_col}, pos, {L})")),
                    ).alias("h"),
                )
                for L in lengths
            ]
        ),
        lambda s: s["h"].isNotNull(),
    )
    rows = pos_df.select(
        F.col(id_col), F.col("pos"), F.explode(entries).alias("e")
    ).select(id_col, "pos", F.col("e.L").alias("L"), F.col("e.h").alias("h"))
    occ_w = Window.partitionBy("L", "h")
    cand = (
        rows.withColumn("_n_occ", F.count(F.lit(1)).over(occ_w))
        .filter(F.col("_n_occ") >= 2)
        .select(id_col, "pos", "L")
    )
    # Verify: materialize the real gram only for candidates (rare by
    # construction) and recount — exactness does not rest on the hash.
    cand_g = cand.join(docs.select(id_col, text_col), id_col).select(
        F.col(id_col),
        "L",
        F.expr(f"substring({text_col}, pos, L)").alias("g"),
    )
    ver_w = Window.partitionBy("L", "g")
    per = (
        cand_g.withColumn("_n_real", F.count(F.lit(1)).over(ver_w))
        .filter(F.col("_n_real") >= 2)
        .groupBy(id_col)
        .agg(F.max("L").alias("max_dup_len"))
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col, F.coalesce("max_dup_len", F.lit(0)).alias("max_dup_len")
        )
    )
