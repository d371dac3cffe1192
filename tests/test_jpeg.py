"""Tests for the pure-Python baseline JPEG codec (operators/jpeg.py).

The decoder must handle streams the encoder never produces (4:2:0
sampling, restart markers, grayscale) — those are hand-built here with the
codec's low-level primitives, mirroring how the GIF tests carry their own
LZW compressor.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from storm_data_etl_spark.operators import jpeg as J
from storm_data_etl_spark.operators import multimodal as M


def closed_form_bgr(i: int) -> tuple[int, int, int]:
    """The DC-only quantization roundtrip the SQL oracle replicates."""
    r8, g8, b8 = (i * 5 + 1) % 256, (i * 3 + 2) % 256, (i * 7 + 3) % 256
    yf = 0.299 * r8 + 0.587 * g8 + 0.114 * b8
    cbf = -0.168736 * r8 - 0.331264 * g8 + 0.5 * b8 + 128.0
    crf = 0.5 * r8 - 0.418688 * g8 - 0.081312 * b8 + 128.0
    qy = math.floor(8.0 * (yf - 128.0) / 16.0 + 0.5)
    qcb = math.floor(8.0 * (cbf - 128.0) / 17.0 + 0.5)
    qcr = math.floor(8.0 * (crf - 128.0) / 17.0 + 0.5)
    y2, cb2, cr2 = qy * 2.0 + 128.0, qcb * 2.125, qcr * 2.125
    clamp = lambda x: min(255, max(0, math.floor(x + 0.5)))  # noqa: E731
    return (
        clamp(y2 + 1.772 * cb2),
        clamp(y2 - 0.344136 * cb2 - 0.714136 * cr2),
        clamp(y2 + 1.402 * cr2),
    )


def test_all_256_tile_colors_match_closed_form():
    """The oracle's validity proof: for every possible tile color, the
    full codec (float DCT → quantize → Huffman → decode → IDCT → color
    convert) lands EXACTLY on the closed-form roundtrip, and no rounding
    input sits near a floor boundary (float noise is ~1e-12)."""
    min_margin = 1.0
    for i in range(256):
        rows = J.jpeg_to_image_rows(J.decode_jpeg(J.synth_jpeg(i, 8, 8)))
        exp = closed_form_bgr(i)
        assert rows[0][0] == exp, f"tile color {i}: {rows[0][0]} != {exp}"
        assert all(rows[r][c] == exp for r in range(8) for c in range(8))
        r8, g8, b8 = (i * 5 + 1) % 256, (i * 3 + 2) % 256, (i * 7 + 3) % 256
        yf = 0.299 * r8 + 0.587 * g8 + 0.114 * b8
        cbf = -0.168736 * r8 - 0.331264 * g8 + 0.5 * b8 + 128.0
        for x in (8.0 * (yf - 128.0) / 16.0 + 0.5, 8.0 * (cbf - 128.0) / 17.0 + 0.5):
            m = abs(x - round(x))
            if m > 1e-9:
                min_margin = min(min_margin, m)
    assert min_margin > 1e-4, f"floor-boundary margin too small: {min_margin}"


def test_multi_tile_geometry_and_partial_edge_blocks():
    dec = J.decode_jpeg(J.synth_jpeg(7, 20, 13))
    assert (dec.width, dec.height, dec.n_components) == (20, 13, 3)
    assert (dec.mcus_x, dec.mcus_y) == (3, 2)
    rows = J.jpeg_to_image_rows(dec)
    for r in (0, 7, 8, 12):
        for c in (0, 7, 8, 15, 16, 19):
            idx = (7 + 7 * (r // 8) + 3 * (c // 8)) % 256
            assert rows[r][c] == closed_form_bgr(idx), (r, c)


def test_gradient_roundtrip_psnr():
    """General (non-constant) content exercises the AC run-length path on
    both sides; baseline JPEG at Annex K tables should land well above
    30 dB on a smooth gradient."""
    h, w = 24, 31
    img = np.zeros((h, w, 3))
    for r in range(h):
        for c in range(w):
            img[r, c] = (r * 255 / (h - 1), c * 255 / (w - 1), (r + c) * 255 / (h + w - 2))
    dec = J.decode_jpeg(J.encode_jpeg_444(img, w, h))
    q = np.clip(np.floor(dec.rgb + 0.5), 0, 255)
    mse = ((q - img) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def _hand_stream(frame_blocks, restart_interval=0):
    """Build an entropy-coded stream from explicit per-block quantized-DC
    values using the encoder's own bit primitives (decoder-only paths:
    4:2:0 MCU interleave, restart markers)."""
    dc_codes = [
        J._build_huffman_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._build_huffman_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
    ]
    ac_codes = [
        J._build_huffman_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        J._build_huffman_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ]
    out = bytearray()
    writer = J._BitWriter()
    prev = {}
    n_rst = 0
    for m, mcu in enumerate(frame_blocks):
        if restart_interval and m and m % restart_interval == 0:
            out += writer.flush()
            writer = J._BitWriter()
            out += bytes((0xFF, 0xD0 + (n_rst % 8)))
            n_rst += 1
            prev = {}
        for comp_key, tbl, qdc in mcu:
            diff = qdc - prev.get(comp_key, 0)
            prev[comp_key] = qdc
            size, bits = J._category(diff)
            code, length = dc_codes[tbl][size]
            writer.write(code, length)
            if size:
                writer.write(bits, size)
            code, length = ac_codes[tbl][0x00]  # EOB
            writer.write(code, length)
    out += writer.flush()
    return bytes(out)


def _headers(sof_comps, sos_comps, dri=0, w=16, h=16):
    out = bytearray(b"\xff\xd8")
    for tq, table in ((0, J.QUANT_LUMA), (1, J.QUANT_CHROMA)):
        zz = bytes(table[J.ZIGZAG[k][0] * 8 + J.ZIGZAG[k][1]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes((tq,)) + zz
    sof = struct.pack(">BHHB", 8, h, w, len(sof_comps))
    for cid, hv, tq in sof_comps:
        sof += bytes((cid, hv, tq))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in (
        (0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        (1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        (0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        (1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ):
        body = bytes(((cls << 4) | tid,)) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes((len(sos_comps),))
    for cid, tables in sos_comps:
        sos += bytes((cid, tables))
    sos += bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return out


def test_decode_420_chroma_upsampling():
    """A hand-built 16×16 4:2:0 JPEG: one MCU = 4 luma blocks + 1 Cb + 1
    Cr. Constant channels → decoded image must be the constant color, and
    the chroma plane must be upsampled 2×2 to cover all four luma blocks."""
    # target: Y=160 (qDC = round(8*32/16)=16), Cb=145, Cr=110
    qy = round(8 * (160 - 128) / 16)  # 16
    qcb = round(8 * (145 - 128) / 17)  # 8
    qcr = round(8 * (110 - 128) / 17)  # -8 (negative DC exercises extend)
    mcu = [("y", 0, qy)] * 4 + [("cb", 1, qcb), ("cr", 1, qcr)]
    stream = _hand_stream([mcu])
    payload = bytes(
        _headers(
            [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)],
            [(1, 0x00), (2, 0x11), (3, 0x11)],
        )
    ) + stream + b"\xff\xd9"
    dec = J.decode_jpeg(payload)
    assert (dec.width, dec.height, dec.mcus_x, dec.mcus_y) == (16, 16, 1, 1)
    y2, cb2, cr2 = qy * 2.0 + 128.0, qcb * 2.125, qcr * 2.125
    exp_b = min(255, max(0, math.floor(y2 + 1.772 * cb2 + 0.5)))
    rows = J.jpeg_to_image_rows(dec)
    assert all(rows[r][c][0] == exp_b for r in range(16) for c in range(16))


def test_decode_restart_markers_reset_dc_prediction():
    """DRI=1 → an RSTn between the two MCUs; the decoder must re-align to
    the marker and reset DC predictors (each MCU encodes its DC as a diff
    from 0, so a decoder that keeps the predictor emits a wrong 2nd MCU)."""
    mcu_a = [("y", 0, 16), ("cb", 1, 0), ("cr", 1, 0)]
    mcu_b = [("y", 0, 4), ("cb", 1, 0), ("cr", 1, 0)]
    # 16×16 at 1×1 sampling → a 2×2 MCU grid, restart after every MCU
    mcus = [mcu_a, mcu_b, mcu_a, mcu_b]
    stream = _hand_stream(mcus, restart_interval=1)
    payload = bytes(
        _headers(
            [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)],
            [(1, 0x00), (2, 0x11), (3, 0x11)],
            dri=1,
        )
    ) + stream + b"\xff\xd9"
    dec = J.decode_jpeg(payload)
    rows = J.jpeg_to_image_rows(dec)
    # MCU grid is 2x2 of 8x8 blocks: (0,0)=A, (0,1)=B, (1,0)=A, (1,1)=B
    ya, yb = 16 * 2.0 + 128.0, 4 * 2.0 + 128.0
    exp_a = min(255, max(0, math.floor(ya + 0.5)))
    exp_b = min(255, max(0, math.floor(yb + 0.5)))
    assert rows[0][0][0] == exp_a
    assert rows[0][8][0] == exp_b
    assert rows[8][0][0] == exp_a
    assert rows[8][8][0] == exp_b


def test_decode_grayscale_single_component():
    mcu = [("y", 0, 16)]
    stream = _hand_stream([mcu] * 4)
    payload = bytes(_headers([(1, 0x11, 0)], [(1, 0x00)])) + stream + b"\xff\xd9"
    dec = J.decode_jpeg(payload)
    assert dec.n_components == 1
    rows = J.jpeg_to_image_rows(dec)
    v = min(255, max(0, math.floor(16 * 2.0 + 128.0 + 0.5)))
    assert rows[0][0] == (v, v, v)


def test_progressive_raises_not_implemented():
    p = bytearray(J.synth_jpeg(1, 8, 8))
    i = p.index(b"\xff\xc0")
    p[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError, match="non-baseline"):
        J.decode_jpeg(bytes(p))


def test_corruption_raises():
    good = J.synth_jpeg(1, 8, 8)
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:40])  # truncated mid-headers
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x89PNG not a jpeg")
    # truncated entropy data
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:-10])


def test_registry_dispatch():
    img = M.decode_image(J.synth_jpeg(3, 10, 9))
    assert (img.width, img.height) == (10, 9)
    assert img.rows[0][0] == closed_form_bgr(3)


def test_decode_noninterleaved_subsampled_grayscale():
    """A single-component SCAN walks the component's own block grid in
    raster order (T.81 A.2.2) — NOT the interleaved MCU walk. 24x16 with
    declared 2x2 sampling: 6 raster blocks; the interleaved walk would
    demand 8 and misplace half of them."""
    dcs = [16, 8, 4, -4, -8, -16]  # 3x2 block grid, distinct bands
    mcus = [[("y", 0, q)] for q in dcs]
    stream = _hand_stream(mcus)  # per-block DPCM chain, EOB-only ACs
    payload = bytes(
        _headers([(1, 0x22, 0)], [(1, 0x00)], w=24, h=16)
    ) + stream + b"\xff\xd9"
    dec = J.decode_jpeg(payload)
    assert (dec.width, dec.height) == (24, 16)
    assert (dec.mcus_x, dec.mcus_y) == (3, 2)
    rows = J.jpeg_to_image_rows(dec)
    for bi, q in enumerate(dcs):
        by, bx = divmod(bi, 3)
        v = min(255, max(0, math.floor(q * 2.0 + 128.0 + 0.5)))
        assert rows[by * 8][bx * 8] == (v, v, v), (by, bx)


def test_multi_scan_baseline_raises_not_implemented():
    """A 3-component frame whose first scan covers only Y must NOT decode
    as a grayscale image silently — it defers to the PIL fallback."""
    import pytest as _pytest

    stream = _hand_stream([[("y", 0, 16)]] * 4)
    payload = bytes(
        _headers(
            [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)],
            [(1, 0x00)],  # scan lists ONLY component 1
        )
    ) + stream + b"\xff\xd9"
    with _pytest.raises(NotImplementedError, match="multi-scan"):
        J.decode_jpeg(payload)
