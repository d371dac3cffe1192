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
    cells = vectors.withColumn(
        "cell", _nearest_cells(vec_col, centroids, 1)[0]["cell"]
    )
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
