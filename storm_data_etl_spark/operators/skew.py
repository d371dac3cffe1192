"""Skew-mitigation primitives: salted two-phase aggregation.

The classic hot-key problem: a groupBy whose key distribution is heavily
skewed sends one key's entire volume to one reducer — at 100 TB that task
runs for hours while the rest of the stage idles. Salting splits the hot
key across ``buckets`` sub-keys for a PARTIAL aggregate, then re-aggregates
the ≤ buckets partials per key — both shuffles are uniform.

Only works for decomposable aggregates (sum/count/min/max, and anything
built from them like avg = sum/count); the salt is provably
result-invariant for those, which is why the demo query
(window_queries.skewed_agg_salted) can be hash-gated against the plain
GROUP BY oracle.

Spark's AQE can split skewed partitions at shuffle-join boundaries, but a
skewed AGGREGATE key (this module's case) still funnels into one task
after map-side combine when one key dominates many partitions' output;
explicit salting is the standing fix.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: decomposable aggregate → (partial expr-builder, final expr-builder)
_DECOMPOSABLE: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]] = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
    salt_from: str | None = None,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy(key + salt) partials, then
    groupBy(key) finals.

    ``aggs`` maps output column name → (function, input column) with
    function one of sum/count/min/max. ``salt_from`` names a column whose
    xxhash64 spreads rows across buckets (any column works — the salt only
    needs to vary within a hot key; defaults to the first agg input).
    Result is provably identical to the single-phase groupBy: each listed
    function is associative-decomposable, so re-aggregating partials
    cannot change the value.
    """
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
