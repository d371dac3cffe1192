"""Bloom-filter membership for cross-corpus operations (Bloom 1970,
public literature — the standard trick for "is this key in that 100 TB
corpus?" without shuffling the big side).

Representation: the filter is a DataFrame of DISTINCT set bit positions —
the sparse form of the bitmap. That keeps construction fully distributed
(one distinct-aggregation, map-side combinable, at most ``m`` rows out) and
makes membership testing a join instead of a literal-array lookup:

    probe side:  explode the key's k positions → join positions → a key is
                 "maybe present" iff ALL k of its positions matched.

At scale the positions side is at most ``m`` rows regardless of how many
keys were inserted — broadcast it when m is small (the usual case; 1M bits
≈ a few MB as longs), let AQE pick a shuffle join when it is not. No
driver-side collect exists anywhere in the path.

Hashes are xxhash64(key, seed) for seed in 0..k-1 — engine-native and
deterministic, which makes the filter reproducible across runs (but not
SQL-twin-able; the gate twin is the exactness regime, where an injective
position map degenerates the filter to exact set membership — see
ml_queries.bloom_exact_regime).

Guarantees (pinned by tests/test_bloom.py):
  - no false negatives: every truly-present key tests positive;
  - false-positive rate bounded ≈ (1 − e^{−kn/m})^k; tests assert the
    measured FPR stays within 3× the formula at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(col, m_bits: int, k_hashes: int):
    """Array column of the k bit positions for a key."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m_bits))
            for s in range(k_hashes)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    position_fn=None,
) -> DataFrame:
    """Build the filter: DISTINCT set positions (≤ m_bits rows, one
    map-side-combinable aggregation over the inserted keys).

    ``position_fn(col, m_bits, k_hashes) -> array column`` overrides the
    xxhash64 family — the exactness-regime gate query passes an injective
    map (identity on a folded key domain), under which the filter
    provably degenerates to exact set membership.
    """
    pf = position_fn or _positions
    return (
        keys.select(F.explode(pf(F.col(key_col), m_bits, k_hashes)).alias("pos"))
        .distinct()
    )


def bloom_might_contain(
    probe: DataFrame,
    key_col: str,
    positions: DataFrame,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    flag_col: str = "might_contain",
    position_fn=None,
    broadcast_positions: bool = True,
) -> DataFrame:
    """Flag each probe row with whether its key is (maybe) in the filter.

    ``broadcast_positions`` (default True) hints the set-positions table
    broadcast — right whenever the filter is driver-shippable (up to tens
    of millions of set bits). For a filter sized to a genuinely huge
    corpus pass False: the join then falls back to AQE's choice
    (shuffle-hash on the uniform position key), trading the
    never-shuffle-the-probe property for not building a multi-GB
    broadcast relation on the driver.

    A key tests positive iff all k of its positions are set. NULL keys
    flag false.

    Optimization r12 (guide §2.3/§3.2): the broadcastable case previously
    keyed FIVE operations on the raw probe key (distinct, exploded
    distinct, two groupBys, the flag join-back) — for text keys that
    means shuffling full document bytes repeatedly, exactly the
    key-is-the-payload anti-pattern. The filter is now assembled into its
    literal bitmap — one row, ceil(m/64) longs — broadcast once, and the
    membership test is a pure map-side expression over each probe row
    (position → word index + mask, all k bits set). The probe corpus
    never shuffles, which is the property the 100 TB design claims. Flag
    values are bit-identical to the join form: same position family,
    same set-bit test. The join form remains as the
    ``broadcast_positions=False`` escape hatch for filters too large to
    ship (it keys on the positions, not the raw key).
    """
    pf = position_fn or _positions
    if broadcast_positions:
        masks = F.array(
            *[
                F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
                for i in range(64)
            ]
        )
        n_words = (m_bits + 63) >> 6
        words = (
            positions.select(
                F.floor(F.col("pos") / 64).cast("int").alias("_w"),
                F.element_at(
                    masks, F.pmod(F.col("pos"), F.lit(64)).cast("int") + 1
                ).alias("_m"),
            )
            .groupBy("_w")
            .agg(F.bit_or("_m").alias("_bits"))
        )
        bitset = words.agg(
            F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias(
                "_map"
            )
        ).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_map"), i), F.lit(0).cast("long")
                ),
            ).alias("_bloom_bits")
        )
        key = F.col(key_col)
        flag = F.when(key.isNull(), F.lit(False)).otherwise(
            F.forall(
                pf(key, m_bits, k_hashes),
                lambda p: (
                    F.element_at(
                        F.col("_bloom_bits"),
                        F.floor(p / 64).cast("int") + 1,
                    ).bitwiseAND(
                        F.element_at(
                            masks, F.pmod(p, F.lit(64)).cast("int") + 1
                        )
                    )
                    != 0
                ),
            )
        )
        return (
            probe.crossJoin(F.broadcast(bitset))
            .withColumn(flag_col, flag)
            .drop("_bloom_bits")
        )
    keys = probe.select(F.col(key_col).alias("_bloom_key")).filter(
        F.col("_bloom_key").isNotNull()
    ).distinct()
    exploded = keys.select(
        "_bloom_key",
        F.explode(pf(F.col("_bloom_key"), m_bits, k_hashes)).alias("pos"),
    ).distinct()  # a key's own colliding hash seeds count one position once
    n_pos = exploded.groupBy("_bloom_key").agg(
        F.count(F.lit(1)).alias("_bloom_npos")
    )
    hits = (
        exploded.join(positions, "pos")
        .groupBy("_bloom_key")
        .agg(F.count(F.lit(1)).alias("_bloom_hits"))
    )
    flags = (
        n_pos.join(hits, "_bloom_key", "left")
        .select(
            "_bloom_key",
            (
                F.coalesce(F.col("_bloom_hits"), F.lit(0)) == F.col("_bloom_npos")
            ).alias(flag_col),
        )
    )
    return (
        probe.join(flags, probe[key_col] == flags["_bloom_key"], "left")
        .withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
        .drop("_bloom_key")
    )


def expected_fpr(n_keys: int, m_bits: int, k_hashes: int) -> float:
    """Textbook false-positive rate (1 − e^{−kn/m})^k."""
    import math

    return (1.0 - math.exp(-k_hashes * n_keys / m_bits)) ** k_hashes
