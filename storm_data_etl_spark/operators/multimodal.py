"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media travel as opaque `binary` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (mapInPandas) so bytes never round-trip through Python row by row.

The decode kernels themselves are STUBS: the image/audio libraries are not
in this container, so each operator ships (a) the real Spark plumbing —
schema, partitioning, batch iteration, UDF signature — and (b) a
deterministic fake decoder (or NotImplementedError for the true-decode
path). Swapping in PIL/librosa later changes one inner function per
operator and nothing in the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Standard layout for a media table: id + payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, frame_payload binary"


def _fake_decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: derives a (width, height, 8-dim feature)
    from the byte content. Replace with PIL decode + model embed in prod.

    Raises NotImplementedError for payloads tagged as real images — the
    container cannot decode them; the fake path handles synthetic fixtures.
    """
    if payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError(
            "real image decoding requires PIL — not available in this container"
        )
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % (1 << 31)
    width = 16 + h % 64
    height = 16 + (h // 64) % 64
    feature = [((h >> i) & 0xFF) / 255.0 for i in range(0, 64, 8)]
    return width, height, feature


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas.

    Plan shape for 100 TB: narrow transform over the scan, batch-at-a-time
    Arrow transfer, output column-pruned to features (payload dropped) so
    downstream stages never shuffle raw bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, feat = _fake_decode_image(payload)
                rows.append((mid, w, h, len(payload), feat))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "feature"]
            )

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame sampling stub: slice the payload into pseudo-frames (every
    ``every_n_bytes`` bytes, up to ``max_frames``). The real implementation
    decodes video and samples keyframes; the plumbing (explode one row into
    N frame rows inside the Arrow batch) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out.append((mid, i, payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame_payload"])

    return df.select("media_id", "payload").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no decode): size/mime distribution.
    The cheap pre-pass a pipeline runs before deciding what to decode."""
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
