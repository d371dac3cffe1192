"""Deterministic dataset splitting and shard packing for training pipelines.

Two operators a 100 TB corpus pipeline needs that plain SQL engines don't
ship as primitives:

- **hash split** — assign every row to train/val/test by a deterministic
  arithmetic hash of its id. Portable across engines (pure integer math, no
  engine-specific hash), stable under repartitioning/reruns, and narrow (no
  shuffle): each executor decides membership locally. This is the property
  `df.randomSplit` lacks — its assignment depends on partitioning.

- **token-budget shard packing** — assign documents to contiguous training
  shards so each shard holds ~``budget`` tokens: a prefix-sum over a stable
  ordering, shard = floor(exclusive_prefix_sum / budget). Built on the
  two-phase distributed prefix sum (`global_prefix_sum`): range shuffle +
  per-partition scan + broadcast partition offsets — never the bare
  global window whose single task caps throughput at one core.

No reference analog (the reference has no sampling surface); part of the
beyond-reference training-data family (SURVEY §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth-style LCG constants (glibc): the bucket is (id mod 2^31) pushed
# through one LCG step, mod 2^31 again. All intermediates fit in a signed
# 64-bit long for any id (2^31 * 1103515245 < 2^63), so ANSI mode is safe.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648  # 2^31


def lcg_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer id."""
    h = F.pmod(F.col(id_col) if isinstance(id_col, str) else id_col, F.lit(_LCG_M))
    h = F.pmod(h * F.lit(_LCG_A) + F.lit(_LCG_C), F.lit(_LCG_M))
    return F.pmod(h, F.lit(n_buckets))


def lcg_bucket_sql(id_expr: str, n_buckets: int = 100) -> str:
    """The identical bucket arithmetic as ANSI SQL (for oracles/other engines)."""
    return (
        f"(((({id_expr}) % {_LCG_M}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % {n_buckets}"
    )


def lcg_value(id_col: Column | str) -> Column:
    """Full-range LCG value in [0, 2^31) — the deterministic shuffle key a
    reproducible data-loader epoch orders by (lcg_bucket with the modulus
    itself as the bucket count)."""
    return lcg_bucket(id_col, _LCG_M)


def lcg_value_sql(id_expr: str) -> str:
    """SQL twin of :func:`lcg_value` (same arithmetic, any ANSI engine)."""
    return lcg_bucket_sql(id_expr, _LCG_M)


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train' / 'val' / 'test') by deterministic
    id-hash percentage. Percentages are integers out of 100; test gets the
    remainder. Same id → same split, on any cluster, any day."""
    if not 0 < train_pct + val_pct <= 100:
        raise ValueError("train_pct + val_pct must be in (0, 100]")
    b = lcg_bucket(id_col, 100)
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row when its id-hash
    bucket falls below the stratum's percentage. The data-mixing primitive
    of corpus curation (e.g. keep 100% of low-resource languages, 10% of
    crawl English): reproducible across engines and reruns, narrow (no
    shuffle — membership decided row-locally), and exactly complementary
    across rates (raising a rate only ADDS rows, so curriculum steps are
    supersets). ``rates``: stratum value → integer percent 0..100.
    """
    b = lcg_bucket(id_col, 100)
    s = F.col(strata_col)
    rate = F.lit(default_rate)
    for value, pct in sorted(rates.items()):
        rate = F.when(s == value, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable EXCLUSIVE prefix sum of ``value_col`` over the global
    ``order_cols`` order (must be a unique key).

    A bare ``Window.orderBy(...)`` computes this in ONE task — the textbook
    non-scalable scan. This is the classic two-phase distributed scan
    (mirroring dedup.global_rank): range-partition on the order columns,
    per-partition exclusive cumsum (parallel), then add each partition's
    offset — the sum of all earlier partitions — via a broadcast join of a
    #partitions-row table. One range shuffle + one tiny aggregate job;
    every stage parallel; result identical to the single-task window.

    Same pinning caveat as global_rank: one materialization is pinned so
    the offset table and the row scan cannot disagree on _pid under AQE;
    callers release it via session.release_pinned().
    """
    from storm_data_etl_spark.session import pin as _pin

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part = part.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )
    part = _pin(part)
    sums = part.groupBy("_pid").agg(F.sum(value_col).alias("_psum"))
    # ~num_partitions rows: a single-task window here is fine by design.
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.withColumn(
        "_off", F.coalesce(F.sum("_psum").over(wo), F.lit(0))
    ).select("_pid", "_off")
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )


def pack_token_shards(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign rows to contiguous shards of ~``budget`` tokens each.

    Rows are taken in ``order_col`` order; a row belongs to shard
    floor(exclusive-prefix-sum / budget), i.e. a shard closes once the
    tokens BEFORE the next row reach the budget. A single over-budget row
    occupies a shard alone rather than being dropped. The prefix sum is
    the two-phase distributed form (global_prefix_sum), not a single-task
    global window."""
    pref = global_prefix_sum(df, token_col, [order_col], out_col="_prefix")
    return pref.withColumn(
        shard_col, F.floor(F.col("_prefix") / F.lit(budget))
    ).drop("_prefix")


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    granularity: int = 10_000,
) -> DataFrame:
    """Deterministic importance sampling: keep a row when its id-hash
    bucket (out of ``granularity``) falls below ``weight_col`` ×
    granularity, i.e. each row survives with probability ≈ its weight in
    [0, 1] — but reproducibly (same id + weight → same decision on any
    cluster, any rerun) and row-locally (narrow, no shuffle, no RNG
    state). The quality-weighted corpus-mixing primitive: upsample what a
    scorer likes without ever double-counting a document. Weights outside
    [0, 1] clamp."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    b = lcg_bucket(id_col, granularity)
    return df.filter(b.cast("double") < w * granularity)


def weighted_sample_without_replacement(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    group_col: str,
    k: int,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group —
    the Efraimidis–Spirakis A-ES scheme (2006, public literature): each
    row draws key = u^(1/w) with u uniform, and the k largest keys per
    group are the sample; inclusion probability is proportional to weight
    with no row ever drawn twice. The uniform comes from the shared LCG
    (not an RNG), so the same ids + weights select the same rows on any
    engine, cluster or rerun; ranking uses the monotone-equivalent
    ln(u)/w (id tie-break) to avoid pow-domain edge cases. One window
    shuffle on the group key; weights ≤ 0 are excluded (their inclusion
    probability is 0).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = lcg_bucket(id_col, _LCG_M)  # full-range LCG value in [0, 2^31)
    u = (h + F.lit(1)).cast("double") / F.lit(float(_LCG_M + 1))
    key = F.log(u) / w.cast("double")  # maximize u^(1/w) ⇔ maximize ln(u)/w
    win = Window.partitionBy(group_col).orderBy(F.desc("_es_key"), F.asc(id_col))
    return (
        df.filter(w > 0)
        .withColumn("_es_key", key)
        .withColumn(rank_col, F.row_number().over(win))
        .filter(F.col(rank_col) <= k)
        .drop("_es_key")
    )
