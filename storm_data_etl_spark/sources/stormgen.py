"""`stormgen` — a Spark 4 Python DataSource generating deterministic mock
NOAA storm reports.

The reference ships a mock-data generator CLI (`cmd/genmock`,
`/root/reference/cmd/genmock/main.go:96-172`) that fabricates RawCSVRecord
fixtures for tests. This module re-expresses that capability as a native
Spark connector: `spark.read.format("stormgen").option("numRows", ...)`
yields RawCSVRecord-shaped rows (the 11-string-field schema of
`schema.RAW_SCHEMA`), and the streaming variant emits them as an unbounded
micro-batch source — a broker-free stand-in for the Kafka topic when
driving the enrichment pipeline in tests or load runs.

Scale/determinism design:
- Every row is a pure function of (seed, row_index) via SplitMix64 — no
  RNG state crosses partition boundaries, so N partitions generate
  disjoint index ranges fully in parallel and a re-run reproduces the
  dataset bit-for-bit on any cluster size/topology.
- The batch reader implements `pushFilters` for `EventType = <lit>`
  equality: the generator then emits only matching rows, demonstrating
  Spark 4 Python-source filter pushdown (the scan does less work rather
  than filtering after the fact).
- Partitions carry only (start, end) index ranges — planning is O(num
  partitions), rows materialize lazily inside each task.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

from storm_data_etl_spark.schema import RAW_SCHEMA

_TYPES = ("hail", "tornado", "wind")
_STATES = ("TX", "OK", "KS", "NE", "MO", "AR", "LA", "IA")
_COUNTIES = ("Tarrant", "San Saba", "Pittsburg", "Cleveland", "Sedgwick")
_DIRS = ("N", "NE", "E", "ESE", "SE", "S", "SW", "W", "NW")
_OFFICES = ("FWD", "SJT", "TSA", "OUN", "ICT", "TOP")


def _splitmix64(x: int) -> int:
    """SplitMix64 finalizer: deterministic 64-bit mix, pure per input."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _row(seed: int, i: int) -> tuple:
    """RawCSVRecord for global index i — mirrors the value shapes genmock
    reads from real SPC CSVs (HHMM time, per-type magnitude column, `'D
    DIR Name'` location, office-suffixed comments)."""
    h = _splitmix64(seed * 0x100000001 + i)

    def pick(shift: int, seq):
        return seq[(h >> shift) % len(seq)]

    etype = pick(0, _TYPES)
    hhmm = f"{(h >> 8) % 24:02d}{(h >> 16) % 60:02d}"
    size, f_scale, speed = "", "", ""
    if etype == "hail":
        size = str(25 + (h >> 24) % 400)          # hundredths of inches
    elif etype == "tornado":
        f_scale = f"EF{(h >> 24) % 6}"
    else:
        speed = str(40 + (h >> 24) % 80)
    dist = 1 + (h >> 32) % 15
    county = pick(40, _COUNTIES)
    lat = 26.0 + ((h >> 16) % 10000) / 1000.0     # 26.0000 - 35.9990
    lon = -106.0 + ((h >> 24) % 12000) / 1000.0   # -106.000 - -94.001
    comments = f"Report {i} ({pick(48, _OFFICES)})"
    return (
        hhmm,
        size,
        f_scale,
        speed,
        f"{dist} {pick(36, _DIRS)} {county}ville",
        county,
        pick(44, _STATES),
        f"{lat:.4f}",
        f"{lon:.4f}",
        comments,
        etype,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _StormGenReader(DataSourceReader):
    def __init__(self, options):
        self.num_rows = int(options.get("numRows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.only_type: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("EventType",)
                and f.value in _TYPES
            ):
                self.only_type = f.value  # generator skips non-matching rows
            else:
                yield f  # Spark re-applies everything we don't handle

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.num_rows // self.num_partitions))
        return [
            _RangePartition(s, min(s + step, self.num_rows))
            for s in range(0, self.num_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            row = _row(self.seed, i)
            if self.only_type is None or row[10] == self.only_type:
                yield row


class _StormGenStreamReader(DataSourceStreamReader):
    """Unbounded variant: each micro-batch emits the next `rowsPerBatch`
    indices. Offsets are plain row counters, so restart-from-checkpoint
    resumes exactly (same pure row function)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))
        self._offset = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._offset += self.rows_per_batch
        return {"index": self._offset}

    def partitions(self, start, end) -> Sequence[InputPartition]:
        s, e = start["index"], end["index"]
        step = max(1, -(-(e - s) // self.num_partitions))
        return [
            _RangePartition(a, min(a + step, e)) for a in range(s, e, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i)

    def commit(self, end) -> None:
        pass  # stateless generator: nothing to clean up


class StormGenDataSource(DataSource):
    """Register with ``spark.dataSource.register(StormGenDataSource)``;
    then ``spark.read.format("stormgen")`` / ``spark.readStream.format(
    "stormgen")``."""

    @classmethod
    def name(cls) -> str:
        return "stormgen"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _StormGenReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StormGenStreamReader(self.options)
