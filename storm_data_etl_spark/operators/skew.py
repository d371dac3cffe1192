"""Skew-handling utilities: salted two-stage aggregation.

AQE's skew-join splitting covers joins; skewed *aggregations* with
heavy-state functions (collect/distinct style) still bottleneck on the hot
key's single reducer. Salting splits each key into `salt` subkeys, pre-
aggregates per subkey (map-side parallel), then merges per key — classic
two-stage combine, expressed declaratively so Catalyst fuses both stages.

For algebraic aggregates (count/sum/min/max) Spark's partial aggregation
already does this implicitly; salting is for the non-algebraic cases
(exact distinct per hot key, collect_set) or for window-free dedup counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    key: str | Column,
    value: str | Column,
    salt: int = 16,
    out_name: str = "n_distinct",
) -> DataFrame:
    """Exact distinct-count per key, skew-safe.

    Stage 1 shuffles on (key, hash(value) % salt) — a hot key's values
    spread over `salt` reducers, each computing a partial distinct set.
    Stage 2 merges the per-salt distinct counts (disjoint by construction:
    the same value always lands in the same salt bucket, so partial
    distincts never overlap and the merge is a plain sum).
    """
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    salted = df.select(
        k.alias("_k"), v.alias("_v"), F.pmod(F.xxhash64(v), F.lit(salt)).alias("_salt")
    )
    partial = salted.groupBy("_k", "_salt").agg(
        F.countDistinct("_v").alias("_partial")
    )
    return (
        partial.groupBy("_k")
        .agg(F.sum("_partial").alias(out_name))
        .withColumnRenamed("_k", key if isinstance(key, str) else "key")
    )


def salted_top_values(
    df: DataFrame,
    key: str | Column,
    value: str | Column,
    n: int,
    salt: int = 16,
) -> DataFrame:
    """Top-n most frequent values per key, skew-safe: counts aggregate in
    two stages ((key, value) is already fine-grained; the explicit salt
    handles the degenerate key+value hot pair), then a per-key window
    selects n. Returns (key, value, count, rank)."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    counts = (
        df.select(k.alias("_k"), v.alias("_v"), F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).alias("_salt"))
        .groupBy("_k", "_v", "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_k", "_v")
        .agg(F.sum("_c").alias("count"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_k").orderBy(F.desc("count"), F.asc("_v"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(F.col("_k").alias("key"), F.col("_v").alias("value"), "count", "rank")
    )
