"""Similarity search over embedding columns (array<float|double>).

Two tiers:
- brute-force cosine top-k — the exact baseline; a single broadcast-join
  scan, O(N·D) per probe. Right answer, linear cost.
- LSH-bucketed ANN (random hyperplanes) — the scale path: probes only
  compare against vectors in matching (or multi-probed) sign buckets, an
  equality join on a packed bucket key.

Everything is zip_with/aggregate expressions (JVM) — no Python in the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import vectors as V

#: hard cap on driver-side training samples (IVF centroids / PQ codebooks):
#: 65k × 64-dim doubles is ~33 MB on the driver — plenty for k-means on a
#: handful of centroids. A larger "sample" is a driver OOM at 100 TB, not a
#: better codebook; callers needing more should train distributed.
MAX_TRAIN_SAMPLE = 65_536


def _check_sample_n(sample_n: int) -> None:
    if sample_n > MAX_TRAIN_SAMPLE:
        raise ValueError(
            f"sample_n={sample_n} exceeds the driver-safe training-sample "
            f"cap {MAX_TRAIN_SAMPLE}: the sample is collect()ed to the driver"
        )


def _deterministic_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Pseudo-random unit hyperplanes from a fixed LCG (no RNG state shared
    with Spark — reproducible across engines and runs)."""
    state = seed

    def nxt() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        # map to (-1, 1)
        return (state / float(1 << 63)) * 2.0 - 1.0

    planes = []
    for _ in range(n_planes):
        v = [nxt() for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _with_exact_cosine(
    df: DataFrame, vec_col: str, probe_vec_col: str, out_col: str = "cosine"
) -> DataFrame:
    """Attach ``out_col`` = V.cosine(vec_col, probe_vec_col) via one Arrow
    kernel pass (optimization r12, guide §4.2): the per-pair JVM
    `aggregate` folds evaluate interpreted per element; the kernel computes
    the identical strict-fold IEEE sequence vectorized
    (operators/vector_kernels, bit-identity pinned in
    tests/test_vector_kernels.py). NULL comes out exactly where V.cosine
    yields NULL (either input NULL or zero-norm) — true nulls, not NaN, so
    window orderings are unchanged."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def run(batches):  # noqa: ANN001
        import numpy as np
        import pandas as pd

        from storm_data_etl_spark.operators import vector_kernels as K

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                pdf[out_col] = pd.Series([], dtype="float64")
                yield pdf
                continue
            va = pdf[vec_col].to_numpy()
            vb = pdf[probe_vec_col].to_numpy()
            null_mask = np.array(
                [a is None or b is None for a, b in zip(va, vb)], dtype=bool
            )
            if null_mask.all():
                pdf[out_col] = pd.Series([None] * n, dtype=object, index=pdf.index)
                yield pdf
                continue
            dim = len(va[int(np.flatnonzero(~null_mask)[0])])
            A = np.zeros((n, dim), dtype=np.float64)
            B = np.zeros((n, dim), dtype=np.float64)
            for i in range(n):
                if not null_mask[i]:
                    A[i] = np.asarray(va[i], dtype=np.float64)
                    B[i] = np.asarray(vb[i], dtype=np.float64)
            na = K.fold_norms(A)
            nb = K.fold_norms(B)
            dot = K.seq_fold_sum(A * B)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (na * nb)
            bad = null_mask | (na == 0.0) | (nb == 0.0)
            out = cos.astype(object)
            out[bad] = None
            pdf[out_col] = pd.Series(out, dtype=object, index=pdf.index)
            yield pdf

    return df.mapInPandas(run, schema)


def brute_force_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    probes is expected to be SMALL (it is broadcast); vectors can be
    arbitrarily large — the plan is a broadcast nested-loop producing
    (probe × vector) scored rows, then a per-probe top-k window. Self-pairs
    (same id) are excluded. Ties break on vec_id for determinism.
    """
    # (Optimization r12 note: routing this cosine through the Arrow kernel
    # was measured SLOWER here — the candidate sets are small and the
    # passthrough of both vector columns through Arrow costs more than the
    # interpreted folds it saves. The kernel stays where it wins: the PQ
    # encode and the _adc_rerank exact stage.)
    scored = vectors.crossJoin(F.broadcast(probes)).withColumn(
        "cosine", V.cosine(vec_col, probe_vec_col)
    )
    scored = scored.filter(F.col(id_col) != F.col(probe_id_col))
    w = Window.partitionBy(probe_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def make_probes(
    vectors: DataFrame,
    probe_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Select probe vectors by id into (probe_id, probe_vec)."""
    return vectors.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing + in-bucket exact
    cosine. Recall < 1 by construction; the scale win is that the join is an
    equality join on the packed sign key, so a 100 TB vector table shuffles
    once on bucket and each probe touches ~N/2^planes candidates.

    (IVF-style coarse quantization would need trained centroids; hyperplane
    LSH is the training-free equivalent and keeps determinism.)
    """
    planes = _deterministic_hyperplanes(n_planes, dim, seed)
    bucketed = vectors.withColumn("bucket", V.hyperplane_signs(vec_col, planes))
    pb = probes.withColumn("bucket", V.hyperplane_signs("probe_vec", planes))
    scored = bucketed.join(F.broadcast(pb), on="bucket").withColumn(
        "cosine", V.cosine(vec_col, "probe_vec")
    )
    scored = scored.filter(F.col(id_col) != F.col("probe_id"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: vectors in
    the same sign bucket with cosine ≥ threshold. Output (id_a, id_b,
    cosine), id_a < id_b. The all-pairs exact variant is the same expression
    without the bucket equality — O(N²), test-scale only."""
    planes = _deterministic_hyperplanes(n_planes, dim, seed)
    bucketed = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", V.hyperplane_signs("vec", planes))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", V.cosine(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round("cosine", 6).alias("cosine"),
    )


def exact_allpairs_cosine(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine pairs (id_a < id_b, cosine >= threshold) via
    triangular block partitioning + a vectorized Arrow kernel — the
    optimization-round replacement for the crossJoin-with-per-pair-HOF form
    (guide §4.2 / §8): same O(N²·D) arithmetic, but each unordered block
    pair (p, q) is computed by ONE numpy kernel call instead of N²/G²
    interpreted `aggregate` lambdas, and the only shuffle is an n_blocks-fold
    replication of the (id, vec) rows — no corpus broadcast, no driver
    collect.

    Bitwise identity with `V.cosine` + `>= threshold` comes from
    operators/vector_kernels (strict left-fold sums via cumsum; see its
    module docstring and tests/test_vector_kernels.py). Returns
    (id_a, id_b, cosine) with cosine the RAW double — callers apply their
    own rounding so the JVM `round` semantics stay exactly as before.

    O(N²) by design (pinning baseline for the LSH path, test-scale only);
    the block scheme is still the canonical distribution for it: work per
    task is (N/G)²·D and replication bytes are G·N·(D+8), so G picks the
    parallelism/replication trade-off.
    """
    import numpy as np
    import pandas as pd

    from storm_data_etl_spark.operators import vector_kernels as K

    G = n_blocks
    rows = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(G)).cast("int").alias("g"),
    )
    rep = rows.select(
        "id",
        "vec",
        "g",
        F.explode(F.sequence(F.lit(0), F.lit(G - 1))).alias("h"),
    ).select(
        F.least("g", "h").alias("bp"),
        F.greatest("g", "h").alias("bq"),
        "g",
        "id",
        "vec",
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        p, q = int(pdf["bp"].iloc[0]), int(pdf["bq"].iloc[0])
        ids = pdf["id"].to_numpy()
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["vec"]], dtype=np.float64
        )
        norms = K.fold_norms(mat)
        if p == q:
            a_idx = np.arange(len(ids))
            b_idx = a_idx
        else:
            gcol = pdf["g"].to_numpy()
            a_idx = np.flatnonzero(gcol == p)
            b_idx = np.flatnonzero(gcol == q)
        if len(a_idx) == 0 or len(b_idx) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        cos = K.cosine_block(mat[a_idx], norms[a_idx], mat[b_idx], norms[b_idx])
        ia = ids[a_idx][:, None]
        ib = ids[b_idx][None, :]
        keep = (
            (ia != ib)
            & (norms[a_idx][:, None] != 0.0)
            & (norms[b_idx][None, :] != 0.0)
            & (cos >= threshold)
        )
        if p == q:  # count each unordered in-block pair once
            keep &= ia < ib
        ai, bi = np.nonzero(keep)
        id_a = ids[a_idx][ai]
        id_b = ids[b_idx][bi]
        c = cos[ai, bi]
        lo = np.minimum(id_a, id_b)
        hi = np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": c})

    return rep.groupBy("bp", "bq").applyInPandas(
        block_pairs, "id_a long, id_b long, cosine double"
    )


def train_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample_n: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic driver-side k-means for IVF coarse quantization.

    Sample = the ``sample_n`` lowest-id vectors (stable under partitioning,
    no RNG); init = evenly spaced sample points; ``iters`` Lloyd steps in
    numpy. Empty cells re-seed to the point farthest from its centroid, so
    every centroid stays distinct. Training cost is constant w.r.t. table
    size (the sample bounds it), which is what makes IVF viable at 100 TB:
    train once on a sample, broadcast the codebook as literals.
    """
    import numpy as np

    _check_sample_n(sample_n)
    rows = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_n)
        .collect()
    )
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    if x.shape[0] == 0:
        raise ValueError("cannot train IVF centroids on an empty table")
    k = min(n_centroids, x.shape[0])
    cent = x[np.linspace(0, x.shape[0] - 1, k).astype(int)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        mindist = d2[np.arange(x.shape[0]), assign]
        for c in range(k):
            members = x[assign == c]
            if members.shape[0]:
                cent[c] = members.mean(axis=0)
            else:
                cent[c] = x[mindist.argmax()]
    return [[float(v) for v in c] for c in cent]


def train_ivf_centroids_distributed(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fully distributed Lloyd's k-means over the WHOLE table — the
    no-sample-cap counterpart of train_ivf_centroids for when the training
    distribution must see every vector, not a bounded sample.

    Per iteration the cluster does all the O(N) work and the driver only
    ever holds k rows:
      - assignment: squared-L2 argmin against the literal centroid array
        (pure JVM expressions, ties to the lowest cell index);
      - update: posexplode to (cell, pos, x) and ONE map-side-combinable
        groupBy — the textbook distributed k-means shuffle, k·dim rows out
        of any partition regardless of N;
      - collect k (cell, per-dim sums, count) rows (k·dim doubles — the
        same bounded driver traffic the reference's own loop state has);
      - empty cells reseed from the points farthest from their assigned
        centroid (distance desc, id asc — deterministic, one distinct ROW
        per empty cell; byte-identical duplicate vectors in the table can
        still seed two cells with the same value, in which case the loser
        re-empties and reseeds on the next iteration).

    Init spreads k seeds across the id range without a global sort (a
    row_number window would single-partition 100 TB): bucket each row by
    floor((id−min_id)·k/span) and take the min-id vector per bucket — one
    map-side-combinable groupBy. Buckets can be empty under clustered ids;
    the iteration-1 empty-cell reseed fills those. Determinism note:
    centroid floats depend on floating-point summation order, which Spark
    does not fix across partitionings, so centroids are deterministic only
    up to last-ulp sum noise; downstream exactness (ivf_topk with
    n_probe = k ≡ brute force) holds for ANY centroids, which is what the
    gate certifies.
    """
    base = vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
    bounds = base.agg(
        F.count(F.lit(1)).alias("n"), F.min("i").alias("lo"), F.max("i").alias("hi")
    ).collect()[0]
    n = bounds["n"]
    if n == 0:
        raise ValueError("cannot train IVF centroids on an empty table")
    k = min(n_centroids, n)
    lo, hi = bounds["lo"], bounds["hi"]
    span = max(int(hi) - int(lo) + 1, 1)
    bucket = F.least(
        F.floor((F.col("i") - F.lit(lo)) * k / F.lit(span)), F.lit(k - 1)
    )
    init_rows = (
        base.withColumn("b", bucket)
        .groupBy("b")
        .agg(F.min(F.struct("i", "v")).alias("seed"))
        .orderBy("b")
        .collect()
    )
    cent = [[float(x) for x in r.seed.v] for r in init_rows]
    # dim is load-bearing, not advisory: a mismatch between the declared
    # dimensionality and the stored vectors corrupts every distance —
    # fail on the driver-side seeds instead of silently training garbage.
    bad = [len(c) for c in cent if len(c) != dim]
    if bad:
        raise ValueError(
            f"dim={dim} but seed vectors have length(s) {sorted(set(bad))}"
        )
    # Clustered ids can leave buckets empty: pad back to k by repeating the
    # first seed — argmin ties go to the lowest cell index, so every padded
    # copy is empty after the first assignment and the empty-cell reseed
    # replaces it with a distinct farthest point (restores full k when the
    # table has ≥ k distinct vectors and iters ≥ 1).
    while len(cent) < k:
        cent.append(list(cent[0]))

    for _ in range(iters):
        nearest = _nearest_cells(vec_col, cent, 1)[0]
        assigned = vectors.select(
            F.col(id_col).alias("i"),
            F.col(vec_col).alias("v"),
            nearest["cell"].alias("cell"),
            nearest["d"].alias("d2"),
        )
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        cells = (
            sums.groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"),
                F.max("c").alias("c"),
            )
            .collect()
        )
        got = {
            int(r["cell"]): [p["s"] / r["c"] for p in r["ps"]] for r in cells
        }
        empty = [c for c in range(k) if c not in got]
        if empty:
            far = (
                assigned.orderBy(F.col("d2").desc(), F.col("i").asc())
                .select("v")
                .limit(len(empty))
                .collect()
            )
            for c, r in zip(empty, far):
                got[c] = [float(x) for x in r.v]
            # fewer distinct points than empty cells (degenerate tiny
            # tables): keep the stale centroid rather than crash
            for c in empty[len(far):]:
                got[c] = cent[c]
        cent = [got[c] for c in range(k)]
    return [[float(x) for x in c] for c in cent]


def _nearest_cells(vec_col: str, centroids: list[list[float]], n: int):
    """Array of the ``n`` nearest centroid indices (squared-L2, index
    tie-break), as pure JVM expressions over the literal codebook."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        V.lit_vector(c),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.array_sort(dists), 1, n)


def _assign_cell(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str
) -> DataFrame:
    """Attach the nearest-centroid `cell` column via one Arrow kernel pass
    (optimization r12, guide §4.2) — the vectorized twin of
    ``_nearest_cells(vec_col, centroids, 1)[0]["cell"]``: strict-fold
    squared L2 per centroid, argmin with the first-match (lowest index)
    tie rule the (d, cell) struct sort had."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = [[float(x) for x in c] for c in centroids]
    schema = StructType(vectors.schema.fields + [StructField("cell", IntegerType())])

    def run(batches):  # noqa: ANN001
        import numpy as np
        import pandas as pd

        from storm_data_etl_spark.operators import vector_kernels as K

        cent64 = np.asarray(cents, dtype=np.float64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                pdf["cell"] = pd.Series([], dtype="int32")
                yield pdf
                continue
            vv = pdf[vec_col].to_numpy()
            null_mask = np.array([v is None for v in vv], dtype=bool)
            X = np.zeros((n, cent64.shape[1]), dtype=np.float64)
            for i, v in enumerate(vv):
                if not null_mask[i]:
                    X[i] = np.asarray(v, dtype=np.float64)
            d2 = np.empty((n, cent64.shape[0]), dtype=np.float64)
            for c in range(cent64.shape[0]):
                diff = X - cent64[c][None, :]
                d2[:, c] = K.seq_fold_sum(diff * diff)
            cell = np.argmin(d2, axis=1).astype(np.int32)
            pdf["cell"] = pd.Series(
                [None if null_mask[i] else cell[i] for i in range(n)],
                dtype=object,
                index=pdf.index,
            )
            yield pdf

    return vectors.mapInPandas(run, schema)


def ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine via IVF: vectors live in their nearest
    centroid's cell; each probe scans its ``n_probe`` nearest cells only.

    The trained-codebook counterpart of lsh_bucketed_topk: data-adaptive
    cells give better recall-per-candidate on clustered embeddings, at the
    price of the (sampled, constant-cost) training step. The join is an
    equality join on cell id — one shuffle of the vector side, probes
    broadcast, ~N·n_probe/n_centroids candidates per probe.
    """
    cells = _assign_cell(vectors, centroids, vec_col)
    pb = probes.withColumn(
        "cell", F.explode(F.transform(
            _nearest_cells("probe_vec", centroids, n_probe), lambda s: s["cell"]
        ))
    )
    scored = cells.join(F.broadcast(pb), on="cell").withColumn(
        "cosine", V.cosine(vec_col, "probe_vec")
    )
    scored = scored.filter(F.col(id_col) != F.col("probe_id"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    sample_n: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic driver-side training of product-quantization codebooks:
    the vector is split into ``m`` contiguous subspaces of dim/m and each
    subspace gets its own ``k``-centroid k-means codebook (trained on the
    UNIT-NORMALIZED sample, because pq_topk quantizes normalized vectors so
    that the asymmetric dot approximates cosine).

    Same scale posture as train_ivf_centroids: the ``sample_n`` lowest-id
    vectors bound training cost regardless of table size; the codebooks
    (m·k·dim/m floats) broadcast as plan literals. PQ's 100 TB win is
    memory-bandwidth compression: a scan compares m byte-codes per vector
    (via k-entry lookup tables) instead of reading dim floats — 64-dim
    float32 → 8 codes is a 32× reduction of the scanned bytes.
    """
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    _check_sample_n(sample_n)
    sub = dim // m
    rows = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_n)
        .collect()
    )
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    if x.shape[0] == 0:
        raise ValueError("cannot train PQ codebooks on an empty table")
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0.0] = 1.0
    x = x / norms[:, None]
    books: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        kk = min(k, xs.shape[0])
        cent = xs[np.linspace(0, xs.shape[0] - 1, kk).astype(int)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            mindist = d2[np.arange(xs.shape[0]), assign]
            for c in range(kk):
                members = xs[assign == c]
                if members.shape[0]:
                    cent[c] = members.mean(axis=0)
                else:
                    cent[c] = xs[mindist.argmax()]
        books.append([[float(v) for v in c] for c in cent])
    return books


def _books_lit(codebooks: list[list[list[float]]]):
    """The codebooks as ONE array<array<array<double>>> literal — plan
    data, not per-centroid expression subtrees."""
    return F.array(
        *[F.array(*[V.lit_vector(c) for c in book]) for book in codebooks]
    )


def _pq_codes(vec_col, codebooks: list[list[list[float]]]):
    """array<int> of per-subspace nearest-centroid indices for a UNIT
    vector column. Loop-based higher-order functions over the literal
    codebook rather than an unrolled m·k expression tree: the unrolled
    form cost ~1 s of fixed plan/codegen overhead per query (measured —
    ann_pq_topk had a NEGATIVE scaling exponent, pure compile cost).
    argmin = array_position of the array_min (first match ⇒ lowest index
    wins ties, same as the (d, idx) sort it replaces)."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    books = _books_lit(codebooks)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _argmin_code(F.slice(vec_col, j * sub + 1, sub), books[j]),
    )


def _argmin_code(slice_col, book_col):
    dists = F.transform(
        book_col,
        lambda cb: F.aggregate(
            F.zip_with(slice_col, cb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")



def _encode_pq(
    vectors: DataFrame, codebooks, vec_col: str, centroids=None
) -> DataFrame:
    """Attach the `_codes` column — unit-normalize, then per-subspace
    nearest-centroid indices (shared by pq_topk / ivfpq_topk) — via ONE
    Arrow kernel pass (optimization r12, guide §4.2: the literal-codebook
    HOF chain evaluated ~m·k·(dim/m)·2 interpreted lambdas per vector;
    operators/vector_kernels.pq_encode_block computes the identical
    strict-fold arithmetic vectorized, bit-identity pinned in
    tests/test_vector_kernels.py). With ``centroids`` given, the same pass
    also attaches the IVF `cell` column (squared-L2 argmin, first-match
    tie rule — exactly _nearest_cells' (d, cell) sort head), saving the
    second Python round trip ivfpq_topk would otherwise pay."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    books = [[[float(x) for x in c] for c in book] for book in codebooks]
    cents = (
        [[float(x) for x in c] for c in centroids] if centroids is not None else None
    )
    extra = [StructField("_codes", ArrayType(IntegerType()))]
    if cents is not None:
        extra.append(StructField("cell", IntegerType()))
    schema = StructType(vectors.schema.fields + extra)

    def enc(batches):  # noqa: ANN001
        import numpy as np
        import pandas as pd

        from storm_data_etl_spark.operators import vector_kernels as K

        books64 = np.asarray(books, dtype=np.float64)
        cent64 = np.asarray(cents, dtype=np.float64) if cents is not None else None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                pdf["_codes"] = pd.Series([], dtype=object)
                if cent64 is not None:
                    pdf["cell"] = pd.Series([], dtype="int32")
                yield pdf
                continue
            vv = pdf[vec_col].to_numpy()
            null_mask = np.array([v is None for v in vv], dtype=bool)
            dim = books64.shape[0] * books64.shape[2]
            X = np.zeros((n, dim), dtype=np.float64)
            for i, v in enumerate(vv):
                if not null_mask[i]:
                    X[i] = np.asarray(v, dtype=np.float64)
            codes, _unit = K.pq_encode_block(X, books64)
            pdf["_codes"] = pd.Series(
                [None if null_mask[i] else codes[i] for i in range(n)],
                dtype=object,
                index=pdf.index,
            )
            if cent64 is not None:
                # NB: cells are assigned on the RAW vector (not the unit
                # form), matching ivfpq_topk's _nearest_cells(vec_col, ...)
                d2 = np.empty((n, cent64.shape[0]), dtype=np.float64)
                for c in range(cent64.shape[0]):
                    diff = X - cent64[c][None, :]
                    d2[:, c] = K.seq_fold_sum(diff * diff)
                cell = np.argmin(d2, axis=1).astype(np.int32)
                pdf["cell"] = pd.Series(
                    [None if null_mask[i] else cell[i] for i in range(n)],
                    dtype=object,
                    index=pdf.index,
                )
            yield pdf

    return vectors.mapInPandas(enc, schema)


def _probe_luts(probes: DataFrame, codebooks) -> DataFrame:
    """Attach the `_luts` column: per-subspace dot tables of the
    unit-normalized probe against every sub-centroid."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    books = _books_lit(codebooks)
    pnrm = V.norm("probe_vec")
    punit = F.transform(F.col("probe_vec"), lambda x: x / F.col("_pnrm"))
    luts = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            books[j],
            lambda cb: F.aggregate(
                F.zip_with(
                    F.slice(F.col("_punit"), j * sub + 1, sub), cb, lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )
    return (
        probes.withColumn("_pnrm", F.when(pnrm == 0.0, F.lit(1.0)).otherwise(pnrm))
        .withColumn("_punit", punit)
        .withColumn("_luts", luts)
        .drop("_pnrm", "_punit")
    )


def _adc_rerank(scored: DataFrame, k: int, rerank: int, id_col: str, vec_col: str) -> DataFrame:
    """Shared ADC tail: approximate score from codes x LUTs, narrow
    projection (drop the LUT doubles BEFORE the window shuffle — measured
    2x), candidate cut, exact-cosine re-rank."""
    adot = F.aggregate(
        F.zip_with(
            F.col("_codes"), F.col("_luts"), lambda cd, lut: F.element_at(lut, cd + 1)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = scored.withColumn("_adot", adot).select(
        id_col, vec_col, "probe_id", "probe_vec", "_adot"
    )
    w1 = Window.partitionBy("probe_id").orderBy(F.desc("_adot"), F.asc(id_col))
    cand = scored.withColumn("_crank", F.row_number().over(w1)).filter(
        F.col("_crank") <= rerank
    )
    # pass only what the kernel needs across the Arrow boundary (guide §4.1)
    exact = _with_exact_cosine(
        cand.select(id_col, vec_col, "probe_id", "probe_vec"), vec_col, "probe_vec"
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )



def pq_topk(
    vectors: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine via product quantization with exact
    re-ranking (FAISS-style ADC: see Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011 — public literature).

    Stage 1 (compressed scan): every vector is represented by m subspace
    codes; each probe carries m lookup tables (its subvector's dot with
    each of the k sub-centroids, computed ONCE per probe). The approximate
    cosine is then m element_at lookups + a sum — no per-pair float math
    over dim elements. Stage 2 (re-rank): the ``rerank`` best candidates
    per probe get exact cosines, so the emitted scores are TRUE cosines
    and only the candidate CHOICE is approximate.

    All JVM expressions; probes/LUTs broadcast. At 100 TB the codes column
    (m bytes/vector) is what streams through the scan — pair with IVF cell
    pruning (ivf_topk) for sublinear candidate counts.
    """
    encoded = _encode_pq(vectors, codebooks, vec_col)
    pb = _probe_luts(probes, codebooks)
    scored = encoded.crossJoin(F.broadcast(pb)).filter(
        F.col(id_col) != F.col("probe_id")
    )
    return _adc_rerank(scored, k, rerank, id_col, vec_col)


def ivfpq_topk(
    vectors: DataFrame,
    probes: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ composed — the full FAISS IVFADC layout (Jégou et al. 2011):
    coarse k-means cells prune candidates to ~N·n_probe/n_cells, and inside
    the probed cells scoring runs on PQ codes via the probe's lookup tables
    (m lookups per candidate, not dim float ops), with an exact-cosine
    re-rank of the survivors. This is the shape that serves ANN over a
    100 TB vector table: the equality join on cell prunes, the code
    column is what streams, and both training steps are bounded samples.
    """
    encoded = _encode_pq(vectors, codebooks, vec_col, centroids=centroids)
    pb = _probe_luts(probes, codebooks).withColumn(
        "cell",
        F.explode(
            F.transform(
                _nearest_cells("probe_vec", centroids, n_probe), lambda s: s["cell"]
            )
        ),
    )
    scored = encoded.join(F.broadcast(pb), on="cell").filter(
        F.col(id_col) != F.col("probe_id")
    )
    return _adc_rerank(scored, k, rerank, id_col, vec_col)
