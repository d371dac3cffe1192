"""Baseline-sequential JPEG codec, pure Python + numpy — no codec library.

A REAL (if minimal) implementation of ITU-T T.81 baseline JPEG from the
public spec: the decoder does marker parsing, Huffman entropy decoding
(DC categories + AC run/size with EOB/ZRL), dequantization, de-zigzag,
8×8 IDCT, optional chroma upsampling, restart markers, and YCbCr→RGB; the
encoder does the forward path (color convert, level shift, DCT, quantize,
DPCM + run-length Huffman). Supported: 8-bit precision, 1- or 3-component
baseline SOF0, sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), DRI.
Progressive (SOF2), arithmetic coding, and 12-bit raise
NotImplementedError so the registry can fall through to PIL where present.

JPEG is lossy, so unlike BMP/PNG/GIF there is no bit-exact closed-form
pixel oracle; structural facts (geometry, MCU/block counts) are exact and
gate-checked, while pixel fidelity is pinned in pytest (exact roundtrip on
constant tiles via a shared-math replication, PSNR bound on gradients).
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order: zigzag_order[k] = (row, col) of the k-th coefficient.
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: ITU-T T.81 Annex K.1 example quantization tables (public spec text).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 example Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix A: F = A f Aᵀ, f = Aᵀ F A."""
    a = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(0.125) if u == 0 else 0.5
            a[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _build_huffman_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length), canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value, for bit-serial decoding."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 un-stuffing;
    stops at (and exposes) RSTn / other markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy stream ran into a marker")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is None:
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            else:
                self.marker = nxt
                raise ValueError("JPEG entropy stream ran into a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Discard pad bits, consume an expected marker (e.g. RSTn);
        returns the marker byte."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        raise ValueError("expected a JPEG marker, found end of data")


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude category decode (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> tuple[int, int]:
    """value → (size, raw bits) for encoding (inverse of _extend)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform (float, no rounding)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def synth_jpeg(seed: int, width: int, height: int) -> bytes:
    """Encode a REAL baseline JFIF JPEG (4:4:4, Annex K tables) of the
    closed-form tile image: each 8×8 tile (tr, tc) is the constant color
    idx = (seed + 7*tr + 3*tc) % 256 → RGB ((idx*5+1)%256, (idx*3+2)%256,
    (idx*7+3)%256). Constant tiles make the DCT energy pure DC, so the
    decode is visually exact; the encoder itself is general (full float
    DCT + quantize + DPCM/run-length Huffman on any block content)."""
    tiles_r = (height + 7) // 8
    tiles_c = (width + 7) // 8
    img = np.zeros((tiles_r * 8, tiles_c * 8, 3))
    for tr in range(tiles_r):
        for tc in range(tiles_c):
            idx = (seed + 7 * tr + 3 * tc) % 256
            img[tr * 8 : tr * 8 + 8, tc * 8 : tc * 8 + 8] = (
                (idx * 5 + 1) % 256,
                (idx * 3 + 2) % 256,
                (idx * 7 + 3) % 256,
            )
    return encode_jpeg_444(img[:height, :width], width, height)


def encode_jpeg_444(rgb: np.ndarray, width: int, height: int) -> bytes:
    """General baseline encoder, 4:4:4, edge-replicated padding."""
    pad_h = (height + 7) // 8 * 8
    pad_w = (width + 7) // 8 * 8
    padded = np.zeros((pad_h, pad_w, 3))
    padded[:height, :width] = rgb
    if pad_w > width:
        padded[:height, width:] = rgb[:, width - 1 : width]
    if pad_h > height:
        padded[height:, :] = padded[height - 1 : height, :]
    ycc = rgb_to_ycbcr(padded)

    quant = [np.array(QUANT_LUMA, float).reshape(8, 8),
             np.array(QUANT_CHROMA, float).reshape(8, 8)]
    dc_codes = [_build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    for br in range(pad_h // 8):
        for bc in range(pad_w // 8):
            for comp in range(3):
                tbl = 0 if comp == 0 else 1
                block = ycc[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8, comp] - 128.0
                coeffs = _A @ block @ _A.T
                q = np.floor(coeffs / quant[tbl] + 0.5).astype(int)
                # DC
                diff = int(q[0, 0]) - prev_dc[comp]
                prev_dc[comp] = int(q[0, 0])
                size, bits = _category(diff)
                code, length = dc_codes[tbl][size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)
                # AC run-length over zigzag order
                zz = [int(q[r, c]) for r, c in ZIGZAG[1:]]
                run = 0
                for v in zz:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[tbl][0xF0]  # ZRL
                        writer.write(code, length)
                        run -= 16
                    size, bits = _category(v)
                    code, length = ac_codes[tbl][(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                    run = 0
                if run:
                    code, length = ac_codes[tbl][0x00]  # EOB
                    writer.write(code, length)
    entropy = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    for tq, table in ((0, QUANT_LUMA), (1, QUANT_CHROMA)):
        zz = bytes(table[ZIGZAG[k][0] * 8 + ZIGZAG[k][1]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes((tq,)) + zz
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes((1, 0x11, 0)) + bytes((2, 0x11, 1)) + bytes((3, 0x11, 1))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        body = bytes(((cls << 4) | tid,)) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes((3,)) + bytes((1, 0x00)) + bytes((2, 0x11)) + bytes((3, 0x11))
    sos += bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class DecodedJpeg:
    """Decode result: float RGB (pre-rounding) plus structural facts."""

    __slots__ = ("width", "height", "n_components", "mcus_x", "mcus_y", "rgb")

    def __init__(self, width, height, n_components, mcus_x, mcus_y, rgb):
        self.width = width
        self.height = height
        self.n_components = n_components
        self.mcus_x = mcus_x
        self.mcus_y = mcus_y
        self.rgb = rgb


def decode_jpeg(payload: bytes) -> DecodedJpeg:
    """REAL baseline JPEG decode (see module docstring for coverage)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError(f"truncated JPEG segment 0xFF{marker:02X}")
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.zeros((8, 8))
                for k in range(64):
                    r, c = ZIGZAG[k]
                    tbl[r, c] = seg[p + 1 + k]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                table = _build_huffman_decoder(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            precision, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns < len(frame["comps"]):
                # multi-scan baseline (each component in its own scan):
                # decoding only the first scan would silently return a
                # partial image — defer to PIL via the registry fallback
                raise NotImplementedError(
                    "multi-scan baseline JPEG (scan covers a component subset)"
                )
            scan = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append(
                    {**comp, "dc": huff_dc[tables >> 4], "ac": huff_ac[tables & 0x0F],
                     "q": quant[comp["tq"]]}
                )
            return _decode_scan(payload, pos, frame, scan, restart_interval)
        # APPn / COM / others: skipped via seg_len
    raise ValueError("JPEG ended without SOS scan")


def _decode_block(reader: _BitReader, comp: dict, pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=float)
    # DC
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        if (length, code) in comp["dc"]:
            size = comp["dc"][(length, code)]
            break
    else:
        raise ValueError("bad DC Huffman code")
    diff = _extend(reader.read_bits(size), size)
    pred += diff
    zz[0] = pred
    # AC
    k = 1
    while k < 64:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in comp["ac"]:
                sym = comp["ac"][(length, code)]
                break
        else:
            raise ValueError("bad AC Huffman code")
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    block = np.zeros((8, 8))
    for k in range(64):
        r, c = ZIGZAG[k]
        block[r, c] = zz[k]
    block *= comp["q"]
    return _A.T @ block @ _A + 128.0, pred


def _decode_scan(payload, pos, frame, scan, restart_interval) -> DecodedJpeg:
    w, h = frame["w"], frame["h"]
    # sampling maxima are a FRAME property (T.81 A.1.1). NOTE: with the
    # multi-scan guard in decode_jpeg, a single-component scan here always
    # belongs to a single-component FRAME (hmax == comp's own factor, so
    # xi/yi degenerate to w/h); the general ceil(w·h_i/hmax) sizing below
    # is kept so enabling multi-scan later doesn't silently mis-size.
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors beyond 2x2")
    reader = _BitReader(payload, pos)
    if len(scan) == 1:
        # Non-interleaved scan (T.81 A.2.2): the MCU is ONE data unit and
        # data units walk the component's OWN block grid in raster order —
        # not the interleaved MCU walk (which would mis-count blocks for
        # any subsampled component).
        comp = scan[0]
        xi = (w * comp["h"] + hmax - 1) // hmax
        yi = (h * comp["v"] + vmax - 1) // vmax
        bw, bh = (xi + 7) // 8, (yi + 7) // 8
        plane = np.zeros((bh * 8, bw * 8))
        pred = 0
        unit = 0
        for byy in range(bh):
            for bxx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    m = reader.align_to_marker()
                    if not (0xD0 <= m <= 0xD7):
                        raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                    pred = 0
                block, pred = _decode_block(reader, comp, pred)
                plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = block
                unit += 1
        planes = [plane]
        mcus_x, mcus_y = bw, bh
    else:
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = (w + mcu_w - 1) // mcu_w
        mcus_y = (h + mcu_h - 1) // mcu_h
        planes = [
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in scan
        ]
        preds = [0] * len(scan)
        mcu_index = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    m = reader.align_to_marker()
                    if not (0xD0 <= m <= 0xD7):
                        raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                    preds = [0] * len(scan)
                for ci, comp in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block, preds[ci] = _decode_block(reader, comp, preds[ci])
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_index += 1
    # upsample each plane to full MCU-grid resolution, then crop
    full = []
    for ci, comp in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        rgb = np.stack([full[0]] * 3, axis=-1)
    else:
        rgb = ycbcr_to_rgb(np.stack(full, axis=-1))
    return DecodedJpeg(w, h, len(scan), mcus_x, mcus_y, rgb)


def jpeg_to_image_rows(dec: DecodedJpeg) -> list[list[tuple[int, int, int]]]:
    """Clamp + round the float RGB into the DecodedImage (b, g, r)-tuple
    raster convention used by the multimodal registry."""
    q = np.clip(np.floor(dec.rgb + 0.5), 0, 255).astype(int)
    return [
        [(int(q[r, c, 2]), int(q[r, c, 1]), int(q[r, c, 0])) for c in range(dec.width)]
        for r in range(dec.height)
    ]
