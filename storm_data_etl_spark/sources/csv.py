"""NOAA SPC CSV sources (S5/S8/S9).

The reference reads three per-type CSVs (hail/torn/wind), trims every cell,
drops rows shorter than the header, injects the event type constant, and
maps the type-specific magnitude column (Size/F_Scale/Speed) into the right
raw field (cmd/genmock/main.go:96-180; cmd/validate/main.go:175-203).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_data_etl_spark.operators.relational import union_all
from storm_data_etl_spark.schema import RAW_SCHEMA

#: (event type, magnitude CSV column) — cmd/genmock/main.go:54-58.
CSV_SPECS = {
    "hail": "Size",
    "tornado": "F_Scale",
    "wind": "Speed",
}

_SHARED_COLS = ("Time", "Location", "County", "State", "Lat", "Lon", "Comments")


def read_storm_csv(
    spark: SparkSession, path: str, event_type: str, mag_col: str | None = None
) -> DataFrame:
    """One per-type NOAA CSV → RAW_SCHEMA rows (S5 + S9).

    Header row maps columns by name; cells are trimmed; short/malformed rows
    are dropped (DROPMALFORMED ≈ the reference's len(row) < len(header)
    skip). The magnitude lands in the type-appropriate field; the other two
    magnitude fields are '' — exactly genmock's column remap.
    """
    if mag_col is None:
        mag_col = CSV_SPECS[event_type]
    # Spark's CSV reader nulls BOTH empty cells and missing trailing cells,
    # so a null test can't tell them apart. An explicit schema + corrupt-
    # record column flags exactly the wrong-arity rows, which we drop —
    # superset of the reference's len(row) < len(header) skip (genmock
    # main.go:122-124; Go's encoding/csv errors on any length mismatch).
    header_cols = spark.read.csv(path, header=True).columns
    schema = ", ".join(f"`{c}` string" for c in header_cols) + ", `_corrupt` string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path, header=True)
    )
    # Spark disallows plans that reference ONLY the corrupt column after
    # pruning (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache() materializes the
    # parse so the filter is legal. Fixture-scale cost; the 100 TB ingest
    # path is parquet, not CSV.
    df = df.cache()
    df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    cols = []
    for name in RAW_SCHEMA.fieldNames():
        if name == "EventType":
            cols.append(F.lit(event_type).alias("EventType"))
        elif name in ("Size", "F_Scale", "Speed"):
            target = {"hail": "Size", "tornado": "F_Scale", "wind": "Speed"}[event_type]
            if name == target and mag_col in df.columns:
                cols.append(F.coalesce(F.trim(F.col(mag_col)), F.lit("")).alias(name))
            else:
                cols.append(F.lit("").alias(name))
        elif name in df.columns:
            cols.append(F.coalesce(F.trim(F.col(name)), F.lit("")).alias(name))
        else:
            cols.append(F.lit("").alias(name))
    return df.select(*cols)


def read_storm_csv_dir(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """Multi-file union by event type (S8): {event_type: csv_path} →
    concatenated RAW_SCHEMA DataFrame (UNION ALL, no dedup — D2)."""
    return union_all(
        [read_storm_csv(spark, p, et) for et, p in paths.items()]
    )
