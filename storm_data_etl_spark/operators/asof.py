"""As-of join: for each left row, the most recent right row at or before its
timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable formulation
here is the union + carry-forward window:

    tag left/right rows → union → window(partition key, order ts) →
    last non-null right payload with rowsBetween(unboundedPreceding, 0) →
    keep left rows

One shuffle on the key (same as any join), no range-bucketing tuning, no
per-group Python. An `applyInPandas` + merge_asof variant would be the
fallback for semantics this form can't express (e.g. nearest-in-time rather
than most-recent-prior).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row: the latest right row with right_ts <= left_ts and
    equal key columns. Right payload columns appear as {prefix}{col};
    NULL when no prior right row exists.

    Ties (right_ts == left_ts) take the right row (<=, matching DuckDB's
    ASOF JOIN ... ON l.ts >= r.ts). When several right rows share one
    timestamp the one latest in (ts, payload-order) wins — pass a
    deterministic payload ordering column if that matters.

    ``tolerance_seconds`` bounds the lookback (pandas ``merge_asof``
    tolerance semantics): a match older than left_ts - tolerance comes
    back NULL. Because the carried row is already the LATEST prior right
    row, a single post-filter is exact — any earlier row is farther away,
    so no second-chance scan exists. The bound costs one comparison per
    row on top of the same one-shuffle plan.
    """
    on = list(on)
    lcols = left.columns
    rstruct = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_payload]
    )
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[c for c in lcols if c not in on]).alias("_lpayload"),
        F.lit(None).cast(
            right.select(rstruct.alias("s")).schema["s"].dataType
        ).alias("_rpayload"),
    )
    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[c for c in lcols if c not in on]).alias("s"))
            .schema["s"]
            .dataType
        ).alias("_lpayload"),
        rstruct.alias("_rpayload"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # Right rows sort before left rows at equal _ts (_is_left 0 < 1) so a
    # same-timestamp right row is visible to the left row (<= semantics).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_last_r", F.last("_rpayload", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        # Integer-microsecond arithmetic: exact, and works for TIMESTAMP_NTZ
        # (which cannot cast to double). The cast to TIMESTAMP is a no-op
        # reinterpretation under the session's pinned-UTC invariant, and the
        # *difference* is timezone-invariant regardless.
        lus = F.unix_micros(F.col("_ts").cast("timestamp"))
        rus = F.unix_micros(F.col("_last_r._rts").cast("timestamp"))
        within = (lus - rus) <= int(round(tolerance_seconds * 1_000_000))
        carried = carried.withColumn(
            "_last_r", F.when(within, F.col("_last_r"))
        )
    out = carried.filter(F.col("_is_left") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_lpayload.{c}").alias(c) for c in lcols if c not in on and c != left_ts],
        *[F.col(f"_last_r.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
    return out
