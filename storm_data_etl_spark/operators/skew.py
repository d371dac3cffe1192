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


#: decomposable aggregate → (partial expr-builder, final expr-builder)
_DECOMPOSABLE = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def two_phase_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
    salt_from: str | None = None,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy(key + salt) partials, then
    groupBy(key) finals — the general-form companion to the specialized
    helpers above, for when a SET of plain algebraic aggregates must run
    skew-safe in one pass (Spark's implicit partial aggregation usually
    covers these; the explicit form exists for hot keys whose combined
    map-output still funnels one reducer, and as the oracle-provable demo
    of salt invariance — see plans/window_queries.skewed_agg_salted).

    ``aggs`` maps output column name → (function, input column) with
    function one of sum/count/min/max. ``salt_from`` names a column whose
    xxhash64 spreads rows across buckets (any column works — the salt only
    needs to vary within a hot key; defaults to the first agg input).
    Result is provably identical to the single-phase groupBy: each listed
    function is associative-decomposable, so re-aggregating partials
    cannot change the value.
    """
    if not aggs:
        raise ValueError("two_phase_agg needs at least one aggregate")
    if "_salt" in df.columns:
        raise ValueError(
            "input already has a '_salt' column — it would be clobbered by "
            "the salting stage; rename it first"
        )
    unknown = [f for f, _ in aggs.values() if f not in _DECOMPOSABLE]
    if unknown:
        raise ValueError(
            f"not decomposable: {unknown}; two_phase_agg supports "
            f"{sorted(_DECOMPOSABLE)}"
        )
    salt_col = salt_from or next(iter(aggs.values()))[1]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    partial_exprs = [
        _DECOMPOSABLE[fn][0](col).alias(f"_p_{out}")
        for out, (fn, col) in aggs.items()
    ]
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    final_exprs = [
        _DECOMPOSABLE[fn][1](f"_p_{out}").alias(out)
        for out, (fn, _col) in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*final_exprs)
