"""Tests for the multimodal binary-column plumbing (stubbed decode)."""

from __future__ import annotations

import pytest

from storm_data_etl_spark.operators import multimodal as M


def _media_df(spark):
    rows = [
        (1, b"fakeimagebytes-aaaaaaaaaaaaaaa" * 100, ("image/fake", 0, 0, 0)),
        (2, b"other-binary-payload-bbbbbbbbb" * 50, ("image/fake", 0, 0, 0)),
        (3, b"", ("application/octet-stream", 0, 0, 0)),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_image_features_shape(spark):
    out = M.extract_image_features(_media_df(spark)).collect()
    assert len(out) == 3
    by_id = {r.media_id: r for r in out}
    assert by_id[1].n_bytes == 3000
    assert len(by_id[1].feature) == 8
    assert all(0.0 <= f <= 1.0 for f in by_id[1].feature)
    # deterministic: same payload → same feature
    again = {r.media_id: r for r in M.extract_image_features(_media_df(spark)).collect()}
    assert again[1].feature == by_id[1].feature


def test_jpeg_decodes_for_real_and_corrupt_raises(spark):
    """Baseline JPEG now has a REAL pure-Python decoder; a valid JPEG must
    decode through the Spark path, and a corrupt one must raise loudly
    rather than fake-decode. Progressive (SOF2) still needs PIL — that
    guard is pinned in tests/test_jpeg.py."""
    from storm_data_etl_spark.operators import jpeg as J

    df = spark.createDataFrame(
        [(9, J.synth_jpeg(9, 12, 10), ("image/jpeg", 0, 0, 0))], M.MEDIA_SCHEMA
    )
    out = M.extract_image_features(df).collect()
    assert (out[0].width, out[0].height) == (12, 10)
    bad = spark.createDataFrame(
        [(9, b"\xff\xd8\xff\xe0-rest-of-jpeg", ("image/jpeg", 0, 0, 0))], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="JPEG|ValueError"):
        M.extract_image_features(bad).collect()


def test_png_decodes_for_real(spark):
    """PNG now has a REAL pure-Python decoder — a valid PNG must decode
    (no PIL involved), and a corrupt one must raise, not fake-decode."""
    df = spark.createDataFrame(
        [(9, M.synth_png(9, 6, 4, color_type=2, filter_type=4), ("image/png", 0, 0, 0))],
        M.MEDIA_SCHEMA,
    )
    out = M.extract_image_features(df).collect()
    assert (out[0].width, out[0].height) == (6, 4)


def test_sample_frames(spark):
    out = M.sample_frames(_media_df(spark), every_n_bytes=1000, max_frames=3).collect()
    frames_1 = [r for r in out if r.media_id == 1]
    assert len(frames_1) == 3
    assert [r.frame_index for r in sorted(frames_1, key=lambda r: r.frame_index)] == [0, 1, 2]
    # empty payload still yields one (empty) frame row
    assert len([r for r in out if r.media_id == 3]) == 1


def test_media_stats(spark):
    out = {r.mime: r.n for r in M.media_stats(_media_df(spark)).collect()}
    assert out == {"image/fake": 2, "application/octet-stream": 1}


# ---------------------------------------------------------------------
# Real pure-Python decoders behind the adapter registry
# ---------------------------------------------------------------------

def test_decode_bmp_round_trip():
    """synth_bmp and decode_bmp share no code; agreement on geometry, row
    order (bottom-up un-reversal) and per-row colors is a real cross-check."""
    img = M.decode_bmp(M.synth_bmp(seed=11, width=5, height=4))
    assert (img.width, img.height) == (5, 4)
    # top-down row r must be ((33+r)%256, (55+r)%256, (77+r)%256)
    for r in range(4):
        assert img.rows[r][0] == ((33 + r) % 256, (55 + r) % 256, (77 + r) % 256)
        assert len(img.rows[r]) == 5
        assert len(set(img.rows[r])) == 1  # constant along the row


def test_decode_bmp_top_down_negative_height():
    """A BMP with negative height stores rows top-down — the decoder must
    NOT reverse them. Build one by patching synth_bmp output's height field
    and reversing the stored rows."""
    import struct

    p = bytearray(M.synth_bmp(seed=3, width=2, height=3))
    stride = ((2 * 3 + 3) // 4) * 4
    rows = [bytes(p[54 + i * stride : 54 + (i + 1) * stride]) for i in range(3)]
    p[54:] = b"".join(reversed(rows))  # now physically top-down
    struct.pack_into("<i", p, 22, -3)
    img = M.decode_bmp(bytes(p))
    assert (img.width, img.height) == (2, 3)
    assert img.rows[0][0] == ((9) % 256, (15) % 256, (21) % 256)  # top row r=0


def test_decode_bmp_stride_padding():
    """width=3 → row payload 9 bytes padded to 12; a decoder that ignores
    stride walks into padding and misreads later rows."""
    img = M.decode_bmp(M.synth_bmp(seed=1, width=3, height=2))
    assert img.rows[1][2] == (3 + 1, 5 + 1, 7 + 1)


def test_decode_bmp_rejects():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M.decode_bmp(b"BM\x00\x00")  # truncated
    with _pytest.raises(ValueError):
        M.decode_bmp(b"PK\x03\x04" + b"\x00" * 60)  # wrong magic


def test_decode_ppm_p6_with_comments():
    payload = b"P6\n# a comment line\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  10, 20, 30]
    )
    img = M.decode_ppm(payload)
    assert (img.width, img.height) == (2, 2)
    # PPM raster is RGB; DecodedImage rows are (b, g, r)
    assert img.rows[0][0] == (0, 0, 255)
    assert img.rows[1][1] == (30, 20, 10)


def test_decode_pgm_p5():
    payload = b"P5\n3 1\n255\n" + bytes([7, 8, 9])
    img = M.decode_ppm(payload)
    assert img.rows == [[(7, 7, 7), (8, 8, 8), (9, 9, 9)]]


def test_registry_dispatch_and_override():
    bmp = M.synth_bmp(seed=1, width=2, height=2)
    assert M.decode_image(bmp).width == 2  # sniffed as BMP
    # fake fallback for arbitrary bytes
    fake = M.decode_image(b"not-an-image")
    assert fake.width > 0 and len(fake.rows) == 1
    # an injected decoder takes precedence
    M.register_image_decoder(
        "test", lambda p: p[:2] == b"BM", lambda p: M.DecodedImage(1, 1, [[(0, 0, 0)]])
    )
    try:
        assert M.decode_image(bmp).width == 1
    finally:
        M.IMAGE_DECODERS.pop(0)


def test_image_decode_stats_operator(spark):
    rows = [(i, M.synth_bmp(seed=i, width=4, height=3), None) for i in (0, 5)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.media_id: r for r in M.image_decode_stats(df).collect()}
    stride = ((4 * 3 + 3) // 4) * 4
    for i in (0, 5):
        r = out[i]
        assert (r.width, r.height) == (4, 3)
        assert r.n_bytes == 54 + 3 * stride
        assert r.top_b == (i * 3) % 256
        blues = [(i * 3 + rr) % 256 for rr in range(3)]
        assert r.mean_b_e2 == (100 * sum(blues) * 4) // 12


def test_sniff_rejects_magic_prefixed_prose():
    """Payloads that merely START with 'BM'/'P6' must fall through to the
    fake decoder (pipelines stay total over mixed corpora); only payloads
    with a plausible full header reach the strict decoders."""
    prose_bmp = b"BMW sales report for Q3 are strong" + b"\x00" * 40
    img = M.decode_image(prose_bmp)
    assert len(img.rows) == 1  # fake decoder shape
    img2 = M.decode_image(b"P6ylon data feed")
    assert len(img2.rows) == 1
    # genuinely-claimed formats still decode (and corrupt ones still raise)
    assert M.decode_image(M.synth_bmp(3, 4, 2)).width == 4
    import pytest as _pytest

    truncated = M.synth_bmp(3, 4, 2)[:60]  # valid header, missing raster
    with _pytest.raises(ValueError):
        M.decode_image(truncated)


# ---------------------------------------------------------------------
# PNG: real inflate + unfilter decoder (stdlib zlib only)
# ---------------------------------------------------------------------

@pytest.mark.parametrize("color_type", [0, 2, 6])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_decode_png_every_filter_and_color(color_type, filter_type):
    """synth_png applies filters FORWARD, decode_png reverses them; the
    closed-form pixel rule is the independent referee. Width 13 makes the
    Paeth/Average left-neighbor offset (bpp) matter; height 9 chains row
    dependencies (Up/Paeth read the fully-unfiltered previous row)."""
    img = M.decode_png(M.synth_png(77, 13, 9, color_type=color_type, filter_type=filter_type))
    assert (img.width, img.height) == (13, 9)
    for r in (0, 4, 8):
        for c in (0, 5, 12):
            v = (77 + 7 * r + 3 * c) % 256
            expect = (v, (v + 40) % 256, (v + 80) % 256) if color_type in (2, 6) else (v, v, v)
            assert img.rows[r][c] == expect


def test_decode_png_palette():
    """Color type 3: indices resolve through PLTE (built by hand — synth_png
    doesn't emit palettes, so this pins the decoder-only path)."""
    import struct
    import zlib

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([10, 20, 30, 40, 50, 60])
    raw = bytes([0, 0, 1, 0, 1, 0])  # two scanlines, filter 0
    png = M._PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    img = M.decode_png(png)
    assert img.rows == [[(30, 20, 10), (60, 50, 40)], [(60, 50, 40), (30, 20, 10)]]


def test_decode_png_rejects_corruption():
    good = M.synth_png(5, 4, 3)
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(good[:-6] + b"\x00\x00\x00\x00" + good[-2:])  # smashed IEND CRC
    with pytest.raises(ValueError):
        M.decode_png(good[:30])  # truncated mid-chunk
    with pytest.raises(ValueError):
        M.decode_png(b"\x89PNG\r\n\x1a\n")  # no chunks at all
    # 16-bit depth: valid PNG, unsupported here → NotImplementedError
    import struct
    import zlib

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    deep = M._PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00")) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        M.decode_png(deep)


def test_png_registry_dispatch():
    assert M.decode_image(M.synth_png(3, 5, 2)).width == 5
    # prose starting with a partial signature falls through to the fake
    img = M.decode_image(b"\x89PNG but not really")
    assert len(img.rows) == 1


# ---------------------------------------------------------------------
# WAV: real RIFF/PCM decoder (stdlib struct only)
# ---------------------------------------------------------------------

@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("channels", [1, 2])
def test_decode_wav_round_trip(bits, channels):
    """8-bit (unsigned, centered) and 16-bit (signed LE) must land on the
    SAME sample values; the synth's junk LIST chunk (odd length) forces the
    decoder to implement word-aligned chunk skipping to even find data."""
    au = M.decode_wav(M.synth_wav(11, 53, rate=8000, channels=channels, bits=bits))
    assert (au.sample_rate, au.channels, au.bits) == (8000, channels, bits)
    assert len(au.frames) == 53
    for i in (0, 26, 52):
        for ch in range(channels):
            assert au.frames[i][ch] == ((11 * 31 + i * 7 + ch * 13) % 201) - 100


def test_decode_wav_rejects():
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFF\x00\x00\x00\x00AVI ")  # not WAVE
    with pytest.raises(ValueError):
        M.decode_wav(M.synth_wav(1, 10)[:-5])  # truncated data chunk
    # float PCM (format 3) is valid WAV but unsupported → NotImplementedError
    import struct

    p = bytearray(M.synth_wav(1, 4, bits=16))
    fmt_at = p.index(b"fmt ") + 8
    struct.pack_into("<H", p, fmt_at, 3)
    with pytest.raises(NotImplementedError):
        M.decode_wav(bytes(p))


def test_audio_decode_stats_operator(spark):
    rows = [(i, M.synth_wav(i, 40 + i, channels=1 + i % 2, bits=8 if i % 3 == 0 else 16), None)
            for i in (0, 1, 2)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.media_id: r for r in M.audio_decode_stats(df).collect()}
    for i in (0, 1, 2):
        n, ch = 40 + i, 1 + i % 2
        samples = [((i * 31 + fi * 7 + c * 13) % 201) - 100 for fi in range(n) for c in range(ch)]
        ch0 = [((i * 31 + fi * 7) % 201) - 100 for fi in range(n)]
        r = out[i]
        assert (r.sample_rate, r.channels, r.n_frames) == (8000, ch, n)
        assert r.duration_ms == n * 1000 // 8000
        assert r.peak_abs == max(abs(v) for v in samples)
        assert r.energy == sum(v * v for v in samples)
        assert r.zero_cross == sum(1 for j in range(1, n) if ch0[j] * ch0[j - 1] < 0)


# ---------------------------------------------------------------------
# GIF: real LZW decoder + interlace
# ---------------------------------------------------------------------

def _lzw_encode_packed(data: bytes, min_code_size: int) -> bytes:
    """Genuine GIF LZW COMPRESSOR (dictionary-building, variable width,
    the encoder-side +1 width-bump offset real encoders use) — exists only
    in this test, to prove the decoder's compression path on streams the
    no-compression synth_gif never produces."""
    clear = 1 << min_code_size
    end = clear + 1
    d = {bytes([i]): i for i in range(clear)}
    next_code, width = clear + 2, min_code_size + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code, wd):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in d:
            w = wc
            continue
        emit(d[w], width)
        if next_code < 4096:
            d[wc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = bytes([byte])
    if w:
        emit(d[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_real_compressed_stream():
    """Random bytes force dictionary growth across the 512 and 1024 width
    boundaries; the repeated tail exercises long dictionary hits."""
    import random

    from storm_data_etl_spark.operators.multimodal import _lzw_decode

    rng = random.Random(1)
    data = bytes(rng.randrange(256) for _ in range(3000)) + b"abcabcabc" * 50
    assert _lzw_decode(_lzw_encode_packed(data, 8), 8) == data


def test_lzw_decode_kwkwk_case():
    """aaaa... forces code == next_code (the KwKwK case) immediately."""
    from storm_data_etl_spark.operators.multimodal import _lzw_decode

    data = b"\x01" * 100 + b"\x02\x01\x01\x02\x02\x02\x01" * 30
    assert _lzw_decode(_lzw_encode_packed(data, 2), 2) == data


@pytest.mark.parametrize("interlaced", [False, True])
def test_decode_gif_round_trip(interlaced):
    """synth_gif builds its stream with literal codes + Clear resets and
    never runs the dictionary; decode_gif must still reproduce the exact
    palette-mapped raster, re-ordering rows when interlaced. Height 17
    exercises all four interlace passes; 3x300 crosses the 253-pixel
    Clear cadence and multi-sub-block chunking."""
    for seed, w, h in [(7, 5, 4), (9, 20, 17), (50, 3, 300)]:
        img = M.decode_gif(M.synth_gif(seed, w, h, interlaced=interlaced))
        assert (img.width, img.height) == (w, h)
        for r in (0, 1, h - 1):
            for c in (0, w - 1):
                i = (seed + 7 * r + 3 * c) % 256
                assert img.rows[r][c] == ((i * 7 + 3) % 256, (i * 3 + 2) % 256, (i * 5 + 1) % 256)


def test_decode_gif_skips_extensions_and_rejects_truncation():
    p = M.synth_gif(3, 4, 2)
    # splice a graphic-control extension between the palette and the image
    # descriptor: decoder must skip it via sub-block walking
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    cut = 13 + 768  # header + global palette
    with_ext = p[:cut] + gce + p[cut:]
    assert M.decode_gif(with_ext).width == 4
    with pytest.raises(ValueError):
        M.decode_gif(p[:30])
    with pytest.raises(ValueError):
        M.decode_gif(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # trailer, no image
    assert M.decode_image(p).width == 4  # registry dispatch


# ---------------------------------------------------------------------
# AVI: real RIFF demux + MJPEG frame sampling
# ---------------------------------------------------------------------

def test_decode_avi_frames_round_trip():
    from storm_data_etl_spark.operators import jpeg as J

    p = M.synth_avi(9, 20, 13, 5)
    w, h, n, frames = M.decode_avi_frames(p)
    assert (w, h, n, len(frames)) == (20, 13, 5, 5)
    for f, payload in enumerate(frames):
        dec = J.decode_jpeg(payload)
        assert (dec.width, dec.height) == (20, 13)
        # frame f's tile (0,0) color comes from seed 9 + f
        from tests.test_jpeg import closed_form_bgr

        assert J.jpeg_to_image_rows(dec)[0][0] == closed_form_bgr((9 + f) % 256)


def test_decode_avi_rejects():
    with pytest.raises(ValueError):
        M.decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        M.decode_avi_frames(M.synth_avi(1, 8, 8, 2)[:40])  # truncated
    # an AVI whose movi list is empty
    import struct as _s

    body = b"AVI " + b"LIST" + _s.pack("<I", 4) + b"movi"
    with pytest.raises(ValueError, match="no video frames"):
        M.decode_avi_frames(b"RIFF" + _s.pack("<I", len(body)) + body)


def test_sample_video_frames_operator(spark):
    """Stride-2 sampling over a 5-frame AVI keeps frames 0/2/4; each kept
    frame is REALLY decoded (stats must match the per-frame closed form)."""
    from tests.test_jpeg import closed_form_bgr

    rows = [(7, M.synth_avi(7, 8, 8, 5), None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.frame_index: r for r in M.sample_video_frames(df, stride=2).collect()}
    assert sorted(out) == [0, 2, 4]
    for fi, r in out.items():
        b, _, _ = closed_form_bgr((7 + fi) % 256)
        assert (r.width, r.height) == (8, 8)
        assert r.top_b == b
        assert r.mean_b_e2 == 100 * b


def test_audio_energy_windows_partial_and_exact(spark):
    """Window energies match a pure-Python decode, including the final
    partial window, on both 8- and 16-bit stereo payloads."""
    from storm_data_etl_spark.operators import multimodal as MM

    payloads = [
        (5, MM.synth_wav(5, 23, channels=2, bits=16)),   # 23 frames -> 3 windows
        (6, MM.synth_wav(6, 40, channels=1, bits=8)),    # exact multiple
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {
        (r.media_id, r.w): r.energy
        for r in MM.audio_energy_windows(df, frame=10).collect()
    }
    for mid, payload in payloads:
        ch0 = [fr[0] for fr in MM.decode_wav(payload).frames]
        n_w = (len(ch0) + 9) // 10
        for w in range(n_w):
            window = ch0[w * 10 : (w + 1) * 10]
            assert got[(mid, w)] == sum(v * v for v in window)
    # 23 frames: windows of 10, 10, 3
    assert {w for (m, w) in got if m == 5} == {0, 1, 2}


def test_image_luminance_histogram_channel_order(spark):
    """A handcrafted BMP with known row colors lands in the exact bins a
    Python replica predicts — swapped b/r channels would move it."""
    from storm_data_etl_spark.operators import multimodal as MM

    payloads = [(9, MM.synth_bmp(9, 6, 5))]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {(r.media_id, r.bin): r.n_px
           for r in MM.image_luminance_histogram(df).collect()}
    expect: dict = {}
    for r in range(5):
        b, g, rr = (9 * 3 + r) % 256, (9 * 5 + r) % 256, (9 * 7 + r) % 256
        lum = (77 * rr + 150 * g + 29 * b) >> 8
        key = (9, lum // 32)
        expect[key] = expect.get(key, 0) + 6
    assert got == expect
