"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media travel as opaque `binary` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (mapInPandas) so bytes never round-trip through Python row by row.

Decoding goes through an injectable adapter registry (register_image_decoder
/ decode_image): formats with a pure-Python parser — 24-bit uncompressed BMP
and binary PPM/PGM — decode for REAL (header parse, stride/padding, bottom-up
row order); PNG/JPEG dispatch to PIL when importable and raise a guarded
NotImplementedError otherwise (this container has no codec libraries —
docs/LIMITS.md); unrecognized payloads fall back to the deterministic fake
used by synthetic fixtures. Swapping in PIL/librosa later changes one
registry entry and nothing in the plan.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

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


class DecodedImage:
    """Decoder-agnostic decode result: geometry + the pixel raster in
    TOP-DOWN row order, each row a list of (b, g, r) byte tuples."""

    __slots__ = ("width", "height", "rows")

    def __init__(self, width: int, height: int, rows: list[list[tuple[int, int, int]]]):
        self.width = width
        self.height = height
        self.rows = rows


def decode_bmp(payload: bytes) -> DecodedImage:
    """REAL pure-Python decode of an uncompressed 24-bit BMP (BITMAPINFOHEADER).

    Parses the file header (pixel-array offset), geometry, bit depth and
    compression mode; walks the raster honoring the 4-byte row stride
    padding and BMP's bottom-up row storage (negative height = top-down).
    No codec library involved — this is a genuine byte-level decoder, not a
    fake, so the Spark decode path can be oracle-checked on real image
    bytes inside this container.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={compression})"
        )
    top_down = height < 0
    height = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    if len(payload) < pix_off + stride * height:
        raise ValueError("truncated BMP pixel array")
    rows: list[list[tuple[int, int, int]]] = []
    for r in range(height):
        stored_row = r if top_down else height - 1 - r  # normalize to top-down
        base = pix_off + stored_row * stride
        rows.append(
            [
                (payload[base + 3 * c], payload[base + 3 * c + 1], payload[base + 3 * c + 2])
                for c in range(width)
            ]
        )
    return DecodedImage(width, height, rows)


def decode_ppm(payload: bytes) -> DecodedImage:
    """REAL pure-Python decode of binary PPM (P6) / PGM (P5): whitespace-
    and-comment-tolerant header parse, then the raster (maxval ≤ 255)."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    gray = payload[:2] == b"P5"
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and '#' comment lines between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    npix = width * height * (1 if gray else 3)
    if len(payload) < pos + npix:
        raise ValueError("truncated PPM raster")
    rows = []
    for r in range(height):
        row = []
        for c in range(width):
            if gray:
                v = payload[pos + r * width + c]
                row.append((v, v, v))
            else:
                base = pos + (r * width + c) * 3
                # PPM stores RGB; normalize to the (b, g, r) tuple order
                row.append((payload[base + 2], payload[base + 1], payload[base]))
        rows.append(row)
    return DecodedImage(width, height, rows)


def _pil_decode(payload: bytes) -> DecodedImage:
    """PNG/JPEG adapter: real decode when PIL is importable, guarded
    NotImplementedError otherwise (docs/LIMITS.md — no codec libs here)."""
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "real PNG/JPEG decoding requires PIL — not available in this container"
        ) from exc
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    w, h = img.size
    px = img.load()
    rows = [[(px[c, r][2], px[c, r][1], px[c, r][0]) for c in range(w)] for r in range(h)]
    return DecodedImage(w, h, rows)


def _fake_decode(payload: bytes) -> DecodedImage:
    """Deterministic fake for synthetic (non-image) fixture payloads:
    derives a 1-row pseudo-raster from a rolling byte hash. Keeps the
    pipeline total over corpora where some payloads aren't images."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % (1 << 31)
    width = 16 + h % 64
    height = 16 + (h // 64) % 64
    row = [(((h >> i) & 0xFF), ((h >> i) & 0xFF), ((h >> i) & 0xFF)) for i in range(0, 24, 8)]
    return DecodedImage(width, height, [row])


def _sniff_bmp(p: bytes) -> bool:
    """'BM' magic alone false-positives on arbitrary text ("BMW sales…");
    require a full file header and a known BITMAPINFOHEADER size so only
    payloads that genuinely CLAIM to be BMPs reach the strict decoder
    (which then fails loudly on corruption — silent fake-decoding of a
    truncated real image would be worse)."""
    if p[:2] != b"BM" or len(p) < 54:
        return False
    (hdr_size,) = struct.unpack_from("<I", p, 14)
    return hdr_size in (40, 52, 56, 64, 108, 124)


def _sniff_ppm(p: bytes) -> bool:
    """Real PPM/PGM magic is ALWAYS followed by whitespace or a comment —
    rejects prose that merely starts with 'P6…'."""
    return p[:2] in (b"P6", b"P5") and (p[2:3].isspace() or p[2:3] == b"#")


#: Injectable decoder registry: (name, sniff(payload)->bool, decode). First
#: sniff hit wins; register_image_decoder prepends, so callers can override
#: any builtin (e.g. swap _pil_decode for a GPU decoder) without touching
#: the Spark plumbing. Sniffs validate beyond the bare magic so random
#: binary/text payloads fall through to the fake decoder (pipelines stay
#: total over mixed corpora) while genuinely-claimed formats fail loudly
#: on corruption.
IMAGE_DECODERS: list[tuple[str, Callable[[bytes], bool], Callable[[bytes], DecodedImage]]] = [
    ("bmp", _sniff_bmp, decode_bmp),
    ("ppm", _sniff_ppm, decode_ppm),
    ("png", lambda p: p[:4] == b"\x89PNG", _pil_decode),
    ("jpeg", lambda p: p[:3] == b"\xff\xd8\xff", _pil_decode),
    ("fake", lambda p: True, _fake_decode),
]


def register_image_decoder(
    name: str,
    sniff: Callable[[bytes], bool],
    decode: Callable[[bytes], DecodedImage],
) -> None:
    """Prepend a decoder to the registry (takes precedence over builtins)."""
    IMAGE_DECODERS.insert(0, (name, sniff, decode))


def decode_image(payload: bytes) -> DecodedImage:
    """Dispatch a payload to the first sniff-matching registered decoder."""
    for _, sniff, decode in IMAGE_DECODERS:
        if sniff(payload):
            return decode(payload)
    raise ValueError("no decoder matched payload")  # unreachable: fake matches all


def _fake_decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Legacy feature-tuple decode used by extract_image_features: dispatch
    through the adapter registry, then summarize the raster into the 8-dim
    feature (channel means, top-left pixel, aspect)."""
    img = decode_image(payload)
    n = img.width * img.height if img.rows else 0
    if img.rows and n:
        flat = [px for row in img.rows for px in row]
        # rasters from the fake decoder are 1-row summaries; means still apply
        npx = len(flat)
        mb = sum(p[0] for p in flat) / npx / 255.0
        mg = sum(p[1] for p in flat) / npx / 255.0
        mr = sum(p[2] for p in flat) / npx / 255.0
        tb, tg, tr = (v / 255.0 for v in img.rows[0][0])
    else:
        mb = mg = mr = tb = tg = tr = 0.0
    denom = img.width + img.height or 1
    feature = [mb, mg, mr, tb, tg, tr, img.width / denom, img.height / denom]
    return img.width, img.height, feature


def synth_bmp(seed: int, width: int, height: int) -> bytes:
    """Write a REAL, spec-conformant uncompressed 24-bit BMP: 14-byte file
    header, 40-byte BITMAPINFOHEADER, bottom-up pixel array with 4-byte row
    stride padding. Top-down row r is the constant color
    (b, g, r) = ((seed*3+r) % 256, (seed*5+r) % 256, (seed*7+r) % 256), so
    an oracle can predict every decoded statistic in closed form while the
    decoder still has to parse the header, honor the stride, and un-reverse
    the bottom-up storage to get row 0 right. Independent of decode_bmp
    (shares no code), so builder/decoder agreement is a genuine cross-check.
    """
    stride = ((width * 3 + 3) // 4) * 4
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 0, 0, 0, 0)
    rows = []
    for stored in range(height):  # stored bottom-up
        r = height - 1 - stored  # top-down index
        px = bytes((( seed * 3 + r) % 256, (seed * 5 + r) % 256, (seed * 7 + r) % 256))
        rows.append(px * width + b"\x00" * (stride - 3 * width))
    return header + info + b"".join(rows)


DECODE_STATS_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, top_b int, mean_b_e2 long"
)


def image_decode_stats(df: DataFrame) -> DataFrame:
    """Decode real image payloads (via the adapter registry) and emit exact
    integer statistics per image: geometry from the header, the blue channel
    of the TOP-LEFT pixel (pins bottom-up handling), and the exact scaled
    blue mean (pins full-raster traversal incl. stride). mapInPandas — one
    Arrow batch in, one out; raw bytes never leave the worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                img = decode_image(payload)
                flat_b = [px[0] for row in img.rows for px in row]
                mean_b_e2 = (100 * sum(flat_b)) // len(flat_b) if flat_b else 0
                rows.append(
                    (
                        mid,
                        img.width,
                        img.height,
                        len(payload),
                        img.rows[0][0][0] if img.rows else 0,
                        mean_b_e2,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "top_b", "mean_b_e2"],
            )

    return df.select("media_id", "payload").mapInPandas(run, DECODE_STATS_SCHEMA)


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
