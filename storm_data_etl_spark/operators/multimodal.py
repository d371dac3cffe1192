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
import zlib
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type: gray, RGB, palette, gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> DecodedImage:
    """REAL pure-Python PNG decode — stdlib ``zlib`` only, no codec library.

    Walks the chunk stream (length/type/data/crc, CRC verified), parses
    IHDR, inflates the concatenated IDAT zlib stream, and reverses the
    per-scanline filters (None/Sub/Up/Average/Paeth with the spec's
    predictor selection and truncating average). Supports bit depth 8 in
    all five color types — gray(0), RGB(2), palette(3, via PLTE),
    gray+alpha(4), RGBA(6) — non-interlaced. Other depths / Adam7 raise
    NotImplementedError (dispatch falls through to PIL when importable).

    Filter reversal operates on the *bytes-per-complete-pixel* offset
    (``bpp = channels`` at depth 8) exactly as the spec defines `a`/`c`.
    """
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, b"", []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if color_type not in _PNG_CHANNELS or comp != 0 or filt != 0:
        raise ValueError(f"bad PNG header (color={color_type}, comp={comp})")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, interlace={interlace})"
        )
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG raster")
    prev = bytearray(stride)
    rows: list[list[tuple[int, int, int]]] = []
    off = 0
    for _r in range(height):
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ft == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average (truncating)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        rowpx: list[tuple[int, int, int]] = []
        for col in range(width):
            if color_type == 0:
                v = line[col]
                rowpx.append((v, v, v))
            elif color_type == 4:
                v = line[col * 2]
                rowpx.append((v, v, v))
            elif color_type == 2:
                base = col * 3
                rowpx.append((line[base + 2], line[base + 1], line[base]))
            elif color_type == 6:
                base = col * 4
                rowpx.append((line[base + 2], line[base + 1], line[base]))
            else:  # palette
                idx = line[col] * 3
                if idx + 3 > len(plte):
                    raise ValueError("PNG palette index out of range")
                rowpx.append((plte[idx + 2], plte[idx + 1], plte[idx]))
        rows.append(rowpx)
        prev = line
    return DecodedImage(width, height, rows)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decompression (variable code width, LSB-first bit
    packing, Clear/End codes, 4096-entry dictionary cap). Pure Python —
    this is the real algorithm, not a fake."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = []
    width = min_code_size + 1
    next_code = clear + 2

    def reset() -> None:
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = clear + 2

    reset()
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without End code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError("bad first LZW code after clear")
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError(f"LZW code {code} beyond dictionary")
            if next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry


#: GIF interlace passes: (first row, step) in pass order.
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> DecodedImage:
    """REAL pure-Python GIF decode: logical screen descriptor, global/local
    color tables, extension-block skipping, the first image descriptor,
    Adam-style 4-pass interlace re-ordering, and true LZW decompression
    (_lzw_decode). Animated GIFs decode to their first frame."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    global_pal = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = payload[pos : pos + 3 * n]
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            n = payload[p]
            p += 1 + n
            if n == 0:
                return p

    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x3B:
            raise ValueError("GIF trailer reached with no image data")
        elif block == 0x2C:
            left, top, width, height = struct.unpack_from("<4H", payload, pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if not pal:
                raise ValueError("GIF image with no color table")
            interlaced = bool(ipacked & 0x40)
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while True:
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                chunks.append(payload[pos : pos + n])
                pos += n
            idx = _lzw_decode(b"".join(chunks), min_code_size)
            if len(idx) < width * height:
                raise ValueError("GIF raster shorter than geometry")
            if interlaced:
                order = [r for first, step in _GIF_PASSES for r in range(first, height, step)]
            else:
                order = list(range(height))
            rows: list[list[tuple[int, int, int]]] = [[] for _ in range(height)]
            for seq, target in enumerate(order):
                base = seq * width
                row = []
                for c in range(width):
                    pi = idx[base + c] * 3
                    if pi + 3 > len(pal):
                        raise ValueError("GIF pixel index beyond palette")
                    row.append((pal[pi + 2], pal[pi + 1], pal[pi]))
                rows[target] = row
            return DecodedImage(width, height, rows)
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF ended without image data")


def synth_gif(seed: int, width: int, height: int, interlaced: bool = False) -> bytes:
    """Write a REAL, spec-conformant GIF89a: logical screen descriptor,
    256-entry global color table, image descriptor (optionally interlaced —
    rows stored in 4-pass order), and a VALID LZW stream built with the
    classic no-compression technique: every pixel emitted as its 9-bit
    literal code, with a Clear code re-issued before the decoder's
    dictionary would force a width increase. Shares no code with
    decode_gif/_lzw_decode (the encoder never builds a dictionary), so
    builder/decoder agreement is a genuine cross-check.

    Palette entry i is (R, G, B) = ((i*5+1)%256, (i*3+2)%256, (i*7+3)%256);
    the pixel index at top-down (r, c) is (seed + 7*r + 3*c) % 256 — both
    closed-form, so an oracle predicts every decoded statistic."""
    pal = bytearray()
    for i in range(256):
        pal += bytes(((i * 5 + 1) % 256, (i * 3 + 2) % 256, (i * 7 + 3) % 256))
    header = b"GIF89a" + struct.pack("<HH", width, height) + bytes((0xF7, 0, 0))
    ipacked = 0x40 if interlaced else 0
    img_desc = b"\x2c" + struct.pack("<4H", 0, 0, width, height) + bytes((ipacked,))
    if interlaced:
        order = [r for first, step in _GIF_PASSES for r in range(first, height, step)]
    else:
        order = list(range(height))
    indices = [
        (seed + 7 * r + 3 * c) % 256 for r in order for c in range(width)
    ]
    # 9-bit codes, LSB-first; clear every 253 pixels so the decoder's
    # next_code never reaches 512 (where it would widen to 10 bits).
    codes: list[int] = [256]
    for i, px in enumerate(indices):
        if i and i % 253 == 0:
            codes.append(256)
        codes.append(px)
    codes.append(257)
    acc = nbits = 0
    packed_bytes = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            packed_bytes.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed_bytes.append(acc & 0xFF)
    data = bytearray((8,))  # LZW minimum code size
    for i in range(0, len(packed_bytes), 255):
        chunk = packed_bytes[i : i + 255]
        data += bytes((len(chunk),)) + chunk
    data += b"\x00"
    return header + bytes(pal) + img_desc + bytes(data) + b"\x3b"


def _png_dispatch(payload: bytes) -> DecodedImage:
    """PNG adapter: the pure-Python decoder first; features it doesn't
    cover (16-bit, Adam7) fall through to PIL when importable."""
    try:
        return decode_png(payload)
    except NotImplementedError:
        return _pil_decode(payload)


def _jpeg_dispatch(payload: bytes) -> DecodedImage:
    """JPEG adapter: the pure-Python/numpy baseline decoder first
    (operators/jpeg.py — real Huffman + dequant + IDCT); profiles it
    doesn't cover (progressive, 12-bit, arithmetic) fall through to PIL
    when importable."""
    from storm_data_etl_spark.operators import jpeg as J  # noqa: PLC0415

    try:
        dec = J.decode_jpeg(payload)
    except NotImplementedError:
        return _pil_decode(payload)
    return DecodedImage(dec.width, dec.height, J.jpeg_to_image_rows(dec))


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
    ("png", lambda p: p[:8] == _PNG_MAGIC, _png_dispatch),
    ("gif", lambda p: p[:6] in (b"GIF87a", b"GIF89a"), decode_gif),
    ("jpeg", lambda p: p[:3] == b"\xff\xd8\xff", _jpeg_dispatch),
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


def synth_png(
    seed: int,
    width: int,
    height: int,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Write a REAL, spec-conformant 8-bit PNG: signature, IHDR/IDAT/IEND
    chunks with correct CRCs, zlib-deflated scanlines with the requested
    filter applied FORWARD on every row (the decoder must reverse it).

    Pixel rule: the blue/gray value at top-down (r, c) is
    ``v = (seed + 7*r + 3*c) % 256`` in every color type (RGB adds
    G = (v+40)%256, R = (v+80)%256; RGBA adds alpha 200), so an oracle can
    predict the decoded blue channel in closed form regardless of color
    type, while the decoder still has to undo Sub/Up/Average/Paeth
    filtering to recover it. Shares no code with decode_png — the filters
    here are the forward direction, the decoder implements the reverse —
    so builder/decoder agreement is a genuine cross-check.
    """
    if color_type not in (0, 2, 6) or filter_type not in range(5):
        raise ValueError("synth_png supports color types 0/2/6, filters 0-4")
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    prev = bytearray(stride)
    out_lines = []
    for r in range(height):
        line = bytearray(stride)
        for c in range(width):
            v = (seed + 7 * r + 3 * c) % 256
            if color_type == 0:
                line[c] = v
            elif color_type == 2:
                base = c * 3
                line[base], line[base + 1], line[base + 2] = (
                    (v + 80) % 256,
                    (v + 40) % 256,
                    v,
                )
            else:  # RGBA
                base = c * 4
                line[base], line[base + 1], line[base + 2], line[base + 3] = (
                    (v + 80) % 256,
                    (v + 40) % 256,
                    v,
                    200,
                )
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            cc = prev[i - nch] if i >= nch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[i] = (line[i] - pred) & 0xFF
        out_lines.append(bytes([filter_type]) + bytes(filt))
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out_lines))
    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


class DecodedAudio:
    """Decoder-agnostic PCM decode result: per-frame samples centered at 0
    (frame = list of per-channel ints), plus rate/geometry."""

    __slots__ = ("sample_rate", "channels", "bits", "frames")

    def __init__(
        self, sample_rate: int, channels: int, bits: int, frames: list[list[int]]
    ):
        self.sample_rate = sample_rate
        self.channels = channels
        self.bits = bits
        self.frames = frames


def decode_wav(payload: bytes) -> DecodedAudio:
    """REAL pure-Python decode of RIFF/WAVE PCM — stdlib ``struct`` only.

    Walks the RIFF chunk list (word-aligned, unknown chunks like LIST/fact
    skipped), parses the fmt chunk (PCM format 1 required), and reads the
    data chunk as interleaved frames. 16-bit signed LE and 8-bit unsigned
    (normalized to signed, centered at 0, per the WAV spec) supported;
    other widths / float formats raise NotImplementedError.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE" or len(payload) < 12:
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_fmt != 1:
        raise NotImplementedError(f"only PCM WAV supported (format={audio_fmt})")
    if bits not in (8, 16):
        raise NotImplementedError(f"only 8/16-bit PCM supported (bits={bits})")
    if channels < 1 or block_align != channels * (bits // 8):
        raise ValueError("inconsistent WAV fmt chunk")
    n_frames = len(data) // block_align
    frames: list[list[int]] = []
    for i in range(n_frames):
        base = i * block_align
        if bits == 16:
            frames.append(
                list(struct.unpack_from(f"<{channels}h", data, base))
            )
        else:  # 8-bit unsigned, centered
            frames.append([data[base + ch] - 128 for ch in range(channels)])
    return DecodedAudio(rate, channels, bits, frames)


def synth_wav(
    seed: int,
    n_frames: int,
    rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Write a REAL RIFF/WAVE PCM file: fmt chunk, a junk LIST chunk (so
    decoders must implement chunk skipping + word alignment), then data.

    Sample rule: frame i, channel ch carries
    ``v = ((seed*31 + i*7 + ch*13) % 201) - 100`` — closed-form, |v| ≤ 100
    so it fits 8-bit PCM too (stored as v+128 unsigned). Shares no code
    with decode_wav.
    """
    if bits not in (8, 16):
        raise ValueError("synth_wav supports 8/16-bit PCM")
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    # deliberately odd-length junk chunk: exercises word-aligned skipping
    junk = b"INFOx"
    frames = bytearray()
    for i in range(n_frames):
        for ch in range(channels):
            v = ((seed * 31 + i * 7 + ch * 13) % 201) - 100
            if bits == 16:
                frames += struct.pack("<h", v)
            else:
                frames.append(v + 128)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"  # pad to even
        + b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_frames long, "
    "duration_ms long, peak_abs int, energy long, zero_cross long"
)


def audio_decode_stats(df: DataFrame) -> DataFrame:
    """Decode real WAV payloads and emit exact integer statistics: fmt-chunk
    geometry, frame count (pins data-chunk framing), integer duration,
    peak |sample|, total energy Σv² across all channels (pins every sample
    byte, exact in int64), and strict sign-change zero crossings on channel
    0 (pins frame ORDER, not just the multiset of samples). mapInPandas —
    Arrow batches, bytes never leave the worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                au = decode_wav(payload)
                flat = [v for fr in au.frames for v in fr]
                ch0 = [fr[0] for fr in au.frames]
                zc = sum(
                    1 for i in range(1, len(ch0)) if ch0[i] * ch0[i - 1] < 0
                )
                rows.append(
                    (
                        mid,
                        au.sample_rate,
                        au.channels,
                        len(au.frames),
                        len(au.frames) * 1000 // au.sample_rate,
                        max((abs(v) for v in flat), default=0),
                        sum(v * v for v in flat),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "peak_abs", "energy", "zero_cross",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_STATS_SCHEMA)


AUDIO_WINDOW_SCHEMA = "media_id long, w long, energy long"


def audio_energy_windows(df: DataFrame, frame: int = 10) -> DataFrame:
    """Decode real WAV payloads and emit per-window channel-0 energy rows:
    window w covers sample indexes [w*frame, (w+1)*frame) (the final
    window may be partial), energy = exact Σv² in int64. The narrow
    Arrow-batched decode emits ~n_frames/frame small rows per media —
    the VAD front-end shape (energy first, segmentation as relational
    ops downstream so the thresholding logic stays in the engine)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                au = decode_wav(bytes(payload) if payload is not None else b"")
                ch0 = [fr[0] for fr in au.frames]
                for w in range((len(ch0) + frame - 1) // frame):
                    window = ch0[w * frame : (w + 1) * frame]
                    rows.append((mid, w, sum(v * v for v in window)))
            yield pd.DataFrame(rows, columns=["media_id", "w", "energy"])

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_WINDOW_SCHEMA)


LUMA_HIST_SCHEMA = "media_id long, bin int, n_px long"


def image_luminance_histogram(df: DataFrame, bins: int = 8) -> DataFrame:
    """Decode real image payloads and emit a per-image luminance histogram:
    integer BT.601 luma ((77·R + 150·G + 29·B) >> 8, exact arithmetic) in
    ``bins`` equal bands over 0-255. Pins per-pixel channel ORDER (the
    rows store (b, g, r) — swapped channels move mass between bins) on
    top of the raster-walk guarantees of image_decode_stats. One
    Arrow-batched map, no shuffle."""
    band = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload) if payload is not None else b"")
                counts: dict[int, int] = {}
                for row in img.rows:
                    for b, g, r in row:
                        lum = (77 * r + 150 * g + 29 * b) >> 8
                        counts[lum // band] = counts.get(lum // band, 0) + 1
                for bn, n in counts.items():
                    rows.append((mid, bn, n))
            yield pd.DataFrame(rows, columns=["media_id", "bin", "n_px"])

    return df.select("media_id", "payload").mapInPandas(run, LUMA_HIST_SCHEMA)


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


def synth_avi(seed: int, width: int, height: int, n_frames: int, fps: int = 25) -> bytes:
    """Write a REAL RIFF/AVI container with an MJPEG video stream: LIST
    hdrl (avih main header + LIST strl with a 'vids'/'MJPG' strh and a
    BITMAPINFOHEADER strf), LIST movi with one word-aligned '00dc' chunk
    per frame, and an idx1 index. Frame f's payload is the real baseline
    JPEG synth_jpeg(seed + f, width, height), so every decoded frame
    statistic is closed-form (the JPEG quantization roundtrip)."""
    from storm_data_etl_spark.operators import jpeg as J  # noqa: PLC0415

    frames = [J.synth_jpeg(seed + f, width, height) for f in range(n_frames)]

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(form: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", form + data)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0,
                                        n_frames, 0, 0xFFFFFFFF, 0, 0, 0, width, height)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_frames(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """REAL pure-Python AVI demux: walks the RIFF tree (word-aligned),
    reads the avih main header for declared geometry/frame count, and
    pulls the compressed video chunks ('00dc'/'00db') out of LIST movi.
    Returns (width, height, declared_frames, frame_payloads) — decoding
    the payloads is the video codec's job (decode_jpeg for MJPEG)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = declared = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, declared
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + clen > end:
                raise ValueError(f"truncated AVI chunk {cid!r}")
            if cid == b"LIST":
                walk(body_start + 4, body_start + clen)
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", payload, body_start)
                declared = vals[4]
                width, height = vals[8], vals[9]
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body_start : body_start + clen])
            pos = body_start + clen + (clen & 1)

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return width, height, declared, frames


VIDEO_FRAME_STATS_SCHEMA = (
    "media_id long, frame_index int, width int, height int, top_b int, mean_b_e2 long"
)


def sample_video_frames(df: DataFrame, stride: int = 2, max_frames: int = 4) -> DataFrame:
    """REAL video frame sampling: demux the AVI container, keep every
    ``stride``-th frame up to ``max_frames``, decode each kept frame with
    the registry's real JPEG decoder, and emit per-frame decode stats.
    One row in → up to max_frames rows out, inside the Arrow batch —
    compressed frames that are never sampled are never decoded (the whole
    point of keyframe sampling at 100 TB)."""
    from storm_data_etl_spark.operators import jpeg as J  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                _w, _h, _n, frames = decode_avi_frames(payload)
                for fi in range(0, len(frames), stride)[:max_frames]:
                    dec = J.decode_jpeg(frames[fi])
                    raster = J.jpeg_to_image_rows(dec)
                    flat_b = [px[0] for row in raster for px in row]
                    rows.append(
                        (
                            mid,
                            fi,
                            dec.width,
                            dec.height,
                            raster[0][0][0],
                            (100 * sum(flat_b)) // len(flat_b),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_index", "width", "height", "top_b", "mean_b_e2"],
            )

    return df.select("media_id", "payload").mapInPandas(run, VIDEO_FRAME_STATS_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no decode): size/mime distribution.
    The cheap pre-pass a pipeline runs before deciding what to decode."""
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
