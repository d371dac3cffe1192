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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a bucketed (and optionally sort-ordered) table: rows are
    hash-partitioned into ``n_buckets`` files per write-task group and the
    layout is recorded in the session catalog. A later join or aggregation
    on ``bucket_cols`` between two tables bucketed the same way runs with
    ZERO exchange — the repeated-join co-location upgrade SCALE.md
    describes for lakes where one join key dominates (e.g. `id` after
    enrichment, `user_id` for sessionized events).

    Works against the in-memory session catalog (no Hive metastore
    needed); at cluster scale the same call records bucketing in the
    shared metastore. Spark's bucket hash = pmod(hash(col), n) — both
    sides must use identical n_buckets.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its layout metadata intact (a plain
    `spark.read.parquet(path)` of the same files would LOSE the bucketing
    and reintroduce the shuffle)."""
    return spark.table(table)
