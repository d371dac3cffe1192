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


#: Columnar lake formats Spark ships natively — both support partition
#: pruning, predicate pushdown, and column projection through the same
#: DataSource V1/V2 machinery, so the layout arguments below hold for
#: either. Parquet is the default; ORC is offered for stacks standardized
#: on it (Hive-heritage warehouses).
LAKE_FORMATS = ("parquet", "orc")


def write_events_partitioned(
    enriched: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_file_rows: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write enriched storm events partitioned by event date and type.

    - `bucket_date` (derived from time_bucket) + `event_type` become
      directory partitions → queries with date/type predicates scan only
      matching directories (partition pruning).
    - Within a partition, rows are repartitioned by id hash so file counts
      stay bounded (small-files problem) — at cluster scale tune
      target_file_rows to the row-group sweet spot (~128 MB files).
    - ``fmt`` selects the columnar container (see LAKE_FORMATS); the
      layout is format-agnostic.
    """
    if fmt not in LAKE_FORMATS:
        raise ValueError(f"fmt must be one of {LAKE_FORMATS}, got {fmt!r}")
    out = enriched.withColumn("bucket_date", F.to_date("time_bucket"))
    if target_file_rows:
        # files per partition ≈ partition_rows / target_file_rows
        out = out.repartition("bucket_date", "event_type")
    (
        out.write.mode(mode)
        .partitionBy("bucket_date", "event_type")
        .format(fmt)
        .save(path)
    )


def read_events_partitioned(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read the partitioned lake back; date/type filters prune partitions
    (verify via .explain → PartitionFilters)."""
    if fmt not in LAKE_FORMATS:
        raise ValueError(f"fmt must be one of {LAKE_FORMATS}, got {fmt!r}")
    return spark.read.format(fmt).load(path)


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


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on ``zcols``: one stats pass for min/max, one
    range-repartition + in-partition sort on the Morton code, then plain
    parquet files whose footer min/max stats are tight in EVERY z column —
    multi-dimensional file skipping from ordinary pruning (see
    functions.zorder).  Scale shape: agg pass is map-side-combined; the
    write is ONE range shuffle (same cost as any sorted write)."""
    from storm_data_etl_spark.functions.zorder import interleave_bits, scale_to_bits

    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in zcols],
        *[F.max(c).alias(f"_hi_{c}") for c in zcols],
    ).first()
    scaled = [
        scale_to_bits(F.col(c), float(stats[f"_lo_{c}"]), float(stats[f"_hi_{c}"]), bits)
        for c in zcols
    ]
    out = (
        df.withColumn("_z", interleave_bits(scaled, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_bytes: int = 128 << 20,
    mode: str = "overwrite",
) -> int:
    """Rewrite a parquet directory into ~``target_bytes`` files (the
    small-files compaction every streaming/lake pipeline needs: thousands of
    micro-batch files → row-group-sized ones).  Returns the file count
    written.  Narrow when coalescing (no shuffle); reads src, writes dest so
    the swap stays atomic for readers (rename at the catalog/path level)."""
    import math
    import os

    df = spark.read.parquet(src)
    total = 0
    for f in df.inputFiles():
        p = f.removeprefix("file:")
        if os.path.exists(p):
            total += os.path.getsize(p)
    n = max(1, math.ceil(total / target_bytes))
    df.coalesce(n).write.mode(mode).parquet(dest)
    return n


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a training-ready sharded dataset: every row lands in shard
    ``pmod(xxhash64(key), n_shards)`` — a pure function of the key, so the
    doc→shard mapping is reproducible across runs, machines, and data
    orderings (the property a resumable training job needs), and shard
    sizes are balanced by the hash. Rows are sorted by key within each
    shard for deterministic iteration order.

    Layout: ``path/shard=K/part-*.parquet``. ``max_records_per_file``
    bounds individual file size (the small-files/giant-files control at
    100 TB: files should land near the row-group sweet spot so training
    readers stream sequential column chunks).

    Plan: one shuffle into exactly n_shards tasks (repartition on the
    shard id), a within-partition sort (no global sort), then a
    partitioned write — each task writes exactly one shard directory.
    """
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    out = sharded.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", key_col
    )
    writer = out.write.mode(mode).partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_training_shard(
    spark: SparkSession, path: str, shard: int | None = None
) -> DataFrame:
    """Read the sharded dataset; a specific shard reads ONLY its directory
    (partition pruning on the shard column) — the per-worker access
    pattern of a distributed training loader."""
    df = spark.read.parquet(path)
    return df if shard is None else df.filter(F.col("shard") == shard)
