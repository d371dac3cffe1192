"""Stream-stream joins with watermarked state cleanup.

The reference has no join in its streaming path (SURVEY §2.7); this module
adds the Structured Streaming join family a Spark-first engine owes its
users: event-time-bounded stream-stream equi-joins (ad-attribution shape)
with watermarks on BOTH sides so join state is dropped once it can no
longer match — bounded state at any input rate.

Semantics notes (Spark's stream-stream join contract):
- Both inputs need watermarks and the join condition needs a time bound
  (here: conversion within ``horizon`` after the impression) — otherwise
  state grows without limit and Spark rejects outer modes.
- Inner joins emit as soon as both sides arrive; the left-outer variant
  emits unmatched left rows only after the watermark passes their join
  window (correctly late, never speculative).
- The same plan runs on batch DataFrames (watermarks are a no-op there),
  so unit tests certify the join expression offline and the streaming
  tests only need to cover cross-batch arrival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    impressions: DataFrame,
    conversions: DataFrame,
    key: str = "user_id",
    imp_ts: str = "imp_ts",
    conv_ts: str = "conv_ts",
    watermark: str = "2 hours",
    horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Attribute each conversion to impressions by the same key within
    ``[imp_ts, imp_ts + horizon]`` — the canonical stream-stream join.

    Output: all impression columns + all conversion columns (key column
    once). ``how='left_outer'`` additionally emits impressions that never
    converted (null conversion columns) once the watermark closes their
    horizon — the "unconverted exposure" feed.

    Scale shape: both streams shuffle on the equi-key (uniform), the
    time-range predicate is evaluated post-match inside the join, and the
    watermark bounds per-key state to the horizon + allowed lateness. In
    batch mode Catalyst runs the same plan as an ordinary equi-join with a
    residual range filter.
    """
    imp = impressions.withWatermark(imp_ts, watermark)
    conv = conversions.withWatermark(conv_ts, watermark)
    cond = (
        (imp[key] == conv[key])
        & (conv[conv_ts] >= imp[imp_ts])
        & (conv[conv_ts] <= imp[imp_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    joined = imp.join(conv, cond, how)
    # drop the duplicate key column from the conversion side
    return joined.drop(conv[key])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    CURRENT state of the static/dimension DataFrame (Spark re-evaluates
    the static side per batch, so a lake-table dimension picks up upstream
    refreshes without restarting the query). No watermark needed — the
    static side holds no streaming state.

    The dimension is broadcast when it fits (``F.broadcast`` hint), which
    keeps the stream side shuffle-free — at 1000 executors this is the
    difference between a per-batch map-side hash join and a full shuffle
    of every micro-batch.
    """
    return stream.join(F.broadcast(dim), key, how)
