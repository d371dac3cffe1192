"""Sampled-permutation Shapley attribution — the >20-channel scale path.

The registered `shapley_channel_attribution` query is EXACT over the full
2^k coalition lattice, which is the right plan while k (the touch-channel
vocabulary) stays small; docs/LIMITS.md draws the scope line at k <= 20.
This module is the path past the line: the classic permutation-sampling
estimator (Castro, Gómez & Tejada 2009, "Polynomial calculation of the
Shapley value based on sampling", Computers & OR 36) — phi_i is the mean
marginal contribution of i over sampled channel orderings, and each
sampled permutation touches only its own k+1 prefix coalitions instead of
the whole lattice: cost O(n_perms * k * masks), independent of 2^k.

Determinism: permutations derive from the repo's shared LCG (the same
constants as operators/sampling.py) keyed by (seed, perm_index, position)
— both engines / reruns rebuild the identical sample. Exactness pin: fed
the FULL factorial set of permutations, the estimator's rational mean
EQUALS the lattice query's phi (asserted in tests/test_round9c_ops.py),
so the approximation error is entirely sampling error, never formula
drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648  # 2^31


def _lcg(col: Column) -> Column:
    return F.pmod(col * F.lit(_LCG_A) + F.lit(_LCG_C), F.lit(_LCG_M))


def converted_masks(events: DataFrame) -> DataFrame:
    """(mask, c): converted-user counts by exact touch bitmask, plus the
    channel dim — the same derivation the exact lattice query uses.
    Returns (channels_df[channel, idx], masks_df[mask, c])."""
    ev = events.filter(F.col("user_id").isNotNull())
    ch = (
        ev.filter(
            F.col("event_type").isNotNull() & (F.col("event_type") != "purchase")
        )
        .select(F.col("event_type").alias("channel"))
        .distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("channel")) - 1)
    )
    u = (
        ev.join(F.broadcast(ch), ev.event_type == ch.channel, "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.expr(
                    "bit_or(CASE WHEN idx IS NOT NULL"
                    " THEN shiftleft(CAST(1 AS BIGINT), idx) END)"
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("mask"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "conv"
            ),
        )
    )
    masks = (
        u.filter(F.col("conv") == 1)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return ch, masks


def _sampled_perms(spark: SparkSession, k: int, n_perms: int, seed: int) -> DataFrame:
    """(perm_id, pos, idx): n_perms LCG-keyed orderings of 0..k-1.

    Fisher-Yates needs sequential state; instead each permutation is the
    argsort of k LCG draws keyed by (seed, perm_id, slot) with the slot
    index as tiebreak — a fixed, replayable bijection from (seed,
    perm_id) to an ordering, identical on every engine/run."""
    base = spark.range(n_perms).select(F.col("id").alias("perm_id"))
    slots = base.select(
        "perm_id", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot")
    )
    key = (
        F.lit(seed % _LCG_M)
        + F.col("perm_id") * F.lit(k)
        + F.col("slot")
    )
    drawn = slots.select(
        "perm_id", "slot", _lcg(_lcg(F.pmod(key, F.lit(_LCG_M)))).alias("draw")
    )
    w = Window.partitionBy("perm_id").orderBy("draw", "slot")
    return drawn.select(
        "perm_id",
        (F.row_number().over(w) - 1).alias("pos"),
        F.col("slot").alias("idx"),
    )


def explicit_perms(spark: SparkSession, perms: list[list[int]]) -> DataFrame:
    """(perm_id, pos, idx) from explicit orderings — the exactness-pin
    input (feed ALL k! permutations and the estimate is exact)."""
    rows = [
        (pid, pos, idx)
        for pid, perm in enumerate(perms)
        for pos, idx in enumerate(perm)
    ]
    return spark.createDataFrame(rows, "perm_id long, pos int, idx int")


def sampled_shapley(
    events: DataFrame,
    *,
    n_perms: int = 64,
    seed: int = 42,
    perms: DataFrame | None = None,
) -> DataFrame:
    """Permutation-sampling Shapley estimate over the touch channels.

    Returns (channel, n_perms, phi_num, phi_den) with the estimate as the
    exact rational phi_num/phi_den (phi_den = number of permutations) —
    integer-exact given the sample, so two runs with the same seed match
    bit-for-bit. Scale shape: perms x prefixes is n_perms*(k+1) coalition
    rows; v() is one containment join against the mask rollup (masks <=
    min(users, 2^k) rows); NOTHING scales with 2^k."""
    spark = events.sparkSession
    ch, masks = converted_masks(events)
    krow = ch.count()  # bounded driver scalar: the channel vocabulary size
    if krow == 0:
        return spark.createDataFrame(
            [], "channel string, n_perms long, phi_num long, phi_den long"
        )
    k = int(krow)
    p = perms if perms is not None else _sampled_perms(spark, k, n_perms, seed)
    # prefix coalition mask after each position (cumulative bit_or)
    wcum = (
        Window.partitionBy("perm_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = p.withColumn(
        "prefix",
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), idx)")).over(wcum).cast("bigint"),
    )
    # v(prefix) and v(prefix without idx) for every (perm, pos): two
    # containment joins against the mask rollup
    both = pref.select(
        "perm_id",
        "pos",
        "idx",
        "prefix",
        (F.col("prefix") - F.expr("shiftleft(CAST(1 AS BIGINT), idx)")).alias("prev"),
    )
    m = F.broadcast(masks)
    v_with = (
        both.join(m, F.expr("(mask & prefix) = mask"), "left")
        .groupBy("perm_id", "pos", "idx")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("v1"))
    )
    v_without = (
        both.join(m, F.expr("(mask & prev) = mask"), "left")
        .groupBy("perm_id", "pos", "idx")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("v0"))
    )
    marg = v_with.join(v_without, ["perm_id", "pos", "idx"]).select(
        "idx", (F.col("v1") - F.col("v0")).alias("delta")
    )
    est = marg.groupBy("idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_perms"),
        F.sum("delta").cast("bigint").alias("phi_num"),
    )
    return (
        est.join(F.broadcast(ch), "idx")
        .select(
            "channel",
            "n_perms",
            "phi_num",
            F.col("n_perms").alias("phi_den"),
        )
    )
