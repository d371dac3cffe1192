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


def write_json_array(df: DataFrame, path: str, go_compat: bool = False) -> None:
    """S6 parity sink: single indented JSON array file.

    Collects to the driver — fixture-scale only (the reference's fixtures
    are ≤ a few thousand rows); the 100 TB path is write_json_lines.

    ``go_compat=True`` reproduces Go's ``json.MarshalIndent(v, "", "  ")``
    byte conventions (cmd/genmock/main.go:182-192) on top of the shared
    2-space indent + trailing newline: HTML-unsafe characters escape as
    \\u003c \\u003e \\u0026 (Go escapes them by default) while non-ASCII
    stays raw UTF-8 (Python's default would \\u-escape it). Key order is
    the DataFrame column order either way — match the reference's struct
    field order when byte parity matters.
    """
    rows = [json.loads(r) for r in df.toJSON().collect()]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    text = json.dumps(rows, indent=2, ensure_ascii=not go_compat)
    if go_compat:
        text = (
            text.replace("&", "\\u0026").replace("<", "\\u003c").replace(">", "\\u003e")
        )
    with open(path, "w") as f:
        f.write(text)
        f.write("\n")
