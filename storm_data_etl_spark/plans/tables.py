"""Parquet table loaders for the driver's TPC-H-ish testdata."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Fact/corpus tables worth splitting for CPU parallelism. The testdata
#: files are single-row-group parquet, so Spark's byte-range splitting
#: yields ONE scan partition per table — every downstream operator would run
#: single-threaded without an explicit repartition. On a real cluster the
#: scan has many files/row-groups and this path is a no-op (guarded by
#: partition count, not table size).
_SPLIT_TABLES = frozenset(
    {"customer", "orders", "lineitem", "events", "documents", "embeddings", "part"}
)


def _target_partitions(spark: SparkSession) -> int:
    env = os.environ.get("SPARK_GRAFT_INPUT_PARTITIONS")
    if env:
        return int(env)
    return spark.sparkContext.defaultParallelism

#: Opt-in cluster-resident tables (SPARK_GRAFT_CACHE_TABLES=1): persist each
#: repartitioned table once per session. The fixture's single-row-group
#: files force a 1-task scan + round-robin exchange in front of EVERY query
#: — an artifact a real lake doesn't have (its scans split by row-group).
#: Caching pays that artifact once instead of per query; bench.py enables it
#: so timings reflect engine compute over distributed-resident input.
_CACHE: dict[tuple[str, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan: Catalyst handles column
    pruning and predicate pushdown from whatever the caller selects.

    events.ts is TIMESTAMP(NANOS) in the file; with nanosAsLong it scans as
    long ns-since-epoch. We keep `ts` as the raw long (exact, totally
    ordered — safe for ordering/dedup) and add `ts_utc` (microsecond
    timestamp) for calendar operations.
    """
    # Queries may run under a caller-built SparkSession (the driver's
    # correctness gate constructs its own): pin UTC so NTZ→LTZ casts
    # (ts_ns) and epoch-aligned windows stay oracle-identical regardless of
    # the host session's timezone. This is a session-global contract —
    # documented in README "Session timezone contract" — so it is
    # check-and-set with a warning rather than a silent overwrite.
    tz = spark.conf.get("spark.sql.session.timeZone", None)
    if tz != "UTC":
        import warnings

        warnings.warn(
            f"storm_data_etl_spark pins spark.sql.session.timeZone=UTC for "
            f"this session (was {tz!r}); all engine time semantics are UTC.",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    caching = os.environ.get("SPARK_GRAFT_CACHE_TABLES") == "1"
    if caching and (sf_dir, name) in _CACHE:
        return _CACHE[(sf_dir, name)]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) file read via nanosAsLong: ns since epoch.
            # Integer `div`, not `/`: double division of an int64 epoch-ns
            # carries ~128 ns rounding error, enough to shift the truncated
            # microsecond across a window boundary.
            df = df.withColumn(
                "ts_utc", F.timestamp_micros(F.expr("ts div 1000"))
            ).withColumn("ts_ns", F.col("ts"))
        elif ts_type is not None:
            # TIMESTAMP(MICROS) file: ts scans as a real timestamp. ts_ns is
            # the exact int64 epoch-nanos twin for interval/gap arithmetic.
            # ts scans as TIMESTAMP_NTZ; unix_micros needs LTZ — with the
            # session timezone pinned to UTC the cast is wall-clock identity.
            df = df.withColumn("ts_utc", F.col("ts")).withColumn(
                "ts_ns",
                F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
            )
    if name in _SPLIT_TABLES:
        target = _target_partitions(spark)
        if df.rdd.getNumPartitions() < max(2, target // 4):
            df = df.repartition(target)
    if caching:
        df = df.persist()
        _CACHE[(sf_dir, name)] = df
    return df
