"""Range (interval) join: match point rows to interval rows where
``start <= ts < end``, with no equi-key required.

Spark's built-in answer to a keyless range predicate is
BroadcastNestedLoopJoin — O(points x intervals) comparisons, fine only
while the interval side broadcasts. The scale path implemented here is
**bucketing**: explode each interval into the fixed-width time buckets it
overlaps, bucket each point once, equi-join on the bucket id, then apply
the exact range predicate. That turns the nested loop into one hash
shuffle on a uniform synthetic key:

    cost = shuffle(points) + shuffle(intervals x avg_buckets_per_interval)

and each (point, interval) candidate pair is produced exactly once,
because a point owns exactly one bucket.

Bucket width is the one knob: ~the median interval length is a good
default (1-2 buckets per interval). Too narrow -> interval-side blowup;
too wide -> more false candidates for the residual filter. Both failure
modes degrade linearly, not quadratically.

No reference analog (the reference's only range predicate is the
bounding-box filter, cmd/genmock/main.go:304-322 — a filter, not a join);
this operator is part of the beyond-reference analytical family alongside
operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``intervals`` on ``start <= point_ts < end``.

    All three boundary columns are timestamps; ``end`` is exclusive.
    Intervals may overlap — a point then matches several intervals (one
    output row per match, standard join semantics). Returns all columns
    of both inputs (names must not collide, except the three ts columns
    which keep their own names).
    """
    if how != "inner":
        raise ValueError("bucketed_range_join supports inner joins only")

    def epoch(c: Column) -> Column:
        # unix seconds as long; sub-second precision is irrelevant for
        # bucketing (the residual predicate uses the original timestamps).
        return F.unix_timestamp(c)

    w = F.lit(int(bucket_width_s))
    p = points.withColumn("_rj_bucket", (epoch(F.col(point_ts)) / w).cast("long"))
    i = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                (epoch(F.col(start_col)) / w).cast("long"),
                (epoch(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    joined = p.join(i, on="_rj_bucket", how="inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_rj_bucket")
