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
