"""File-based ingestion for multimodal and raw-text corpora, plus ORC lake
round-trip.

Completes the source matrix around sources/csv.py (NOAA CSV), jsonio.py
(fixture JSON), kafka.py (stream), parquet.py (lake):

- `read_binary_files` — Spark's `binaryFile` source mapped onto the
  multimodal MEDIA table layout (operators/multimodal.py): each file
  becomes one row of (media_id, payload, meta) with a mime guess from the
  extension. `pathGlobFilter`/`recursiveFileLookup` push listing-side
  pruning into the file index, so a 100 TB media lake only stats the
  matching objects.
- `read_text_corpus` — one document per file (`wholetext`) with a
  deterministic doc key from the file path; the ingestion shape for
  plain-text training corpora feeding the documents-table operators.
- `write_orc` / `read_orc` — columnar alternative to parquet for lake
  interchange; same partition-pruning layout contract as
  parquet.write_events_partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → mime guess for the media meta struct (JVM-side CASE WHEN).
_MIME_BY_EXT = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "mkv": "video/x-matroska",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of media files as MEDIA-layout rows.

    `binaryFile` yields (path, modificationTime, length, content) with the
    whole object as one `binary` cell; we derive a deterministic
    `media_id` (first 63 bits of xxhash64 of the path — stable across
    re-ingests), carry the payload opaquely, and prefill the meta struct
    with a mime guess (width/height/duration stay NULL until a decode
    operator fills them — see operators/multimodal.py).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)

    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mime = F.lit(None).cast("string")
    for e, m in _MIME_BY_EXT.items():
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return raw.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )


def read_text_corpus(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """One document per file: (doc_key, text, n_chars) with doc_key = md5
    of the file path (stable across re-ingests and shuffles, unlike
    monotonically_increasing_id). Feeds the documents-table operators
    (dedup, quality, tokenization) from a plain-text lake."""
    # format/load, not DataFrameReader.text(): the text() method's
    # wholetext kwarg default would clobber the option.
    reader = spark.read.format("text").option("wholetext", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).select(
        F.input_file_name().alias("source_path"), F.col("value").alias("text")
    )
    return raw.select(
        F.md5("source_path").alias("doc_key"),
        "text",
        F.length("text").alias("n_chars"),
        "source_path",
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with the same directory-partition contract as the parquet
    lake writer (predicates on partition_cols become partition pruning)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
