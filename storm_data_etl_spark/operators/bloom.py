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

    A key tests positive iff all k of its positions are set. Membership is
    computed once per DISTINCT key (identical keys are identically present
    by definition — and distinct-first also avoids generated row ids, whose
    recomputation across plan branches is nondeterministic): distinct keys
    → explode positions → join the (broadcast) positions table → a key with
    k distinct matched positions is positive; the flag table joins back
    onto the probe rows. NULL keys flag false.
    """
    keys = probe.select(F.col(key_col).alias("_bloom_key")).filter(
        F.col("_bloom_key").isNotNull()
    ).distinct()
    pf = position_fn or _positions
    exploded = keys.select(
        "_bloom_key",
        F.explode(pf(F.col("_bloom_key"), m_bits, k_hashes)).alias("pos"),
    ).distinct()  # a key's own colliding hash seeds count one position once
    n_pos = exploded.groupBy("_bloom_key").agg(
        F.count(F.lit(1)).alias("_bloom_npos")
    )
    pos_side = F.broadcast(positions) if broadcast_positions else positions
    hits = (
        exploded.join(pos_side, "pos")
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
