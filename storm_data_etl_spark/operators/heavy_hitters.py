"""Misra–Gries heavy hitters, distributed via mergeable summaries.

Misra & Gries (1982) keep k counters over a stream; every key with true
frequency > n/(k+1) survives, and each surviving estimate undercounts by
at most n/(k+1). Agarwal et al. (PODS 2012 §3.1) prove the summary is
MERGEABLE: an MG(k) summary of any substream equals its exact counts
minus the (k+1)-th largest count (zero-clipped), and merging two
summaries is a pointwise sum followed by the same trim — which makes the
whole sketch expressible declaratively in DataFrame ops, with no per-row
imperative loop anywhere:

    per-partition counts  →  subtract per-partition (k+1)-th largest
    →  sum by key         →  subtract merged (k+1)-th largest, keep top k

Scale shape: the stream is touched once (map-side-combinable counts
keyed by (partition, key)); thresholds come from a partition-keyed
window (parallel); the merged table is ≤ #partitions × k rows BY
CONSTRUCTION, so the final trim is a single task over a provably bounded
set. The reference has no sketch surface at all — this extends the
CMS/Bloom/HLL family (SURVEY §2 extensions) with the deterministic
counter-based alternative (CMS overcounts, MG undercounts; together they
bracket true frequencies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def misra_gries_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """MG(k) summary of ``df[key_col]``: ≤ k rows (key, est_count), each
    estimate in [true − n/(k+1), true]. Exact when the distinct-key count
    never exceeds k (the exactness regime the oracle gate certifies)."""
    s = df.select(F.col(key_col).alias("hh_key")).withColumn(
        "_pid", F.spark_partition_id()
    )
    per_part = s.groupBy("_pid", "hh_key").agg(F.count(F.lit(1)).alias("cnt"))
    w_pid = Window.partitionBy("_pid").orderBy(F.desc("cnt"), F.asc("hh_key"))
    ranked = per_part.withColumn("_rnk", F.row_number().over(w_pid))
    thr = ranked.filter(F.col("_rnk") == k + 1).select(
        "_pid", F.col("cnt").alias("_thr")
    )
    summaries = (
        ranked.join(F.broadcast(thr), "_pid", "left")
        .withColumn("adj", F.col("cnt") - F.coalesce(F.col("_thr"), F.lit(0)))
        .filter(F.col("adj") > 0)
    )
    merged = summaries.groupBy("hh_key").agg(F.sum("adj").alias("est"))
    # ≤ #partitions × k rows by construction: single-task trim by design.
    # spark_partition_id()*0+1 is a non-foldable constant — Catalyst folds
    # a bare lit() out of the partition spec, leaving the empty-partition
    # whole-table window path.
    one = F.spark_partition_id() * 0 + 1
    w_all = Window.partitionBy(one).orderBy(F.desc("est"), F.asc("hh_key"))
    return (
        merged.repartition(1)
        .withColumn("_rnk", F.row_number().over(w_all))
        .withColumn(
            "_gthr",
            F.coalesce(
                F.max(F.when(F.col("_rnk") == k + 1, F.col("est"))).over(
                    Window.partitionBy(one)
                ),
                F.lit(0),
            ),
        )
        .withColumn("est_count", F.col("est") - F.col("_gthr"))
        .filter((F.col("est_count") > 0) & (F.col("_rnk") <= k))
        .select("hh_key", F.col("est_count").cast("bigint").alias("est_count"))
    )
