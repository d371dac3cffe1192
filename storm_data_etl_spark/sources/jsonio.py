"""JSON array fixture source/sink (S6/S7).

The reference's fixtures are indented JSON *arrays* (cmd/genmock/
main.go:182-192), not JSON-lines — so reads use multiLine and writes offer
an array-file mode for byte-compatible fixtures alongside the scalable
JSON-lines mode.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from storm_data_etl_spark.schema import RAW_SCHEMA


def read_json_array(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S7: load a JSON array file into typed rows (declared schema, never
    inferred — mirrors the generic typed loadJSON, validate main.go:205-215)."""
    return spark.read.option("multiLine", "true").schema(schema).json(path)


def read_raw_fixture(spark: SparkSession, path: str) -> DataFrame:
    """The raw storm-report fixture (RawCSVRecord array)."""
    return read_json_array(spark, path, RAW_SCHEMA)


def write_json_lines(df: DataFrame, path: str) -> None:
    """Scalable sink: JSON-lines, one file per partition."""
    df.write.mode("overwrite").json(path)


def write_json_array(df: DataFrame, path: str) -> None:
    """S6 parity sink: single indented JSON array file.

    Collects to the driver — fixture-scale only (the reference's fixtures
    are ≤ a few thousand rows); the 100 TB path is write_json_lines.
    """
    rows = [json.loads(r) for r in df.toJSON().collect()]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
