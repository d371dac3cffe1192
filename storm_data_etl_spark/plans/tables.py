"""Parquet table loaders for the driver's TPC-H-ish testdata."""

from __future__ import annotations

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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan: Catalyst handles column
    pruning and predicate pushdown from whatever the caller selects.

    events.ts is TIMESTAMP(NANOS) in the file; with nanosAsLong it scans as
    long ns-since-epoch. We keep `ts` as the raw long (exact, totally
    ordered — safe for ordering/dedup) and add `ts_utc` (microsecond
    timestamp) for calendar operations.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts_utc", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df
