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
) -> DataFrame:
    """For every left row: the latest right row with right_ts <= left_ts and
    equal key columns. Right payload columns appear as {prefix}{col};
    NULL when no prior right row exists.

    Ties (right_ts == left_ts) take the right row (<=, matching DuckDB's
    ASOF JOIN ... ON l.ts >= r.ts). When several right rows share one
    timestamp the one latest in (ts, payload-order) wins — pass a
    deterministic payload ordering column if that matters.
    """
    on = list(on)
    lcols = left.columns
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[c for c in lcols if c not in on]).alias("_lpayload"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
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
        F.struct(*right_payload).alias("_rpayload"),
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
    out = carried.filter(F.col("_is_left") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_lpayload.{c}").alias(c) for c in lcols if c not in on and c != left_ts],
        *[F.col(f"_last_r.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
    return out
