"""Pure-numpy codec tests (no Spark): BMP/WAV/RAWV round trips, size
formulas, format sniffing, and malformed-input rejection."""

from __future__ import annotations

import numpy as np
import pytest

from degdb_spark.functions import codecs as C


def _pixels(w, h, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (64, 64), (33, 17), (176, 128)])
def test_bmp_round_trip(w, h):
    px = _pixels(w, h)
    enc = C.encode_bmp(px)
    assert len(enc) == C.bmp_size(w, h)
    assert enc[:2] == b"BM"
    assert (C.decode_bmp(enc) == px).all()


def test_bmp_row_padding():
    # w=33 → 99 bytes/row → padded to 100; decode must strip the pad
    px = _pixels(33, 5)
    assert C.bmp_size(33, 5) == 54 + 5 * 100
    assert (C.decode_bmp(C.encode_bmp(px)) == px).all()


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_bmp(b"not a bmp at all, definitely")
    with pytest.raises(ValueError):
        C.encode_bmp(np.zeros((4, 4), dtype=np.uint8))  # no channel dim
    # 8-bit BMPs are out of scope — must refuse, not garble
    good = bytearray(C.encode_bmp(_pixels(4, 4)))
    good[28] = 8  # bpp field
    with pytest.raises(ValueError):
        C.decode_bmp(bytes(good))


def test_wav_round_trip():
    s = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    enc = C.encode_wav(s, 16000)
    assert len(enc) == C.wav_size(s.size)
    rate, dec = C.decode_wav(enc)
    assert rate == 16000
    assert (dec == s).all()


def test_wav_tolerates_extra_chunks():
    s = np.arange(-50, 50, dtype=np.int16)
    enc = bytearray(C.encode_wav(s, 8000))
    # splice a LIST chunk between fmt and data (word-aligned, 4-byte body)
    insert_at = 12 + 24  # after fmt chunk
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = bytes(enc[:insert_at]) + extra + bytes(enc[insert_at:])
    rate, dec = C.decode_wav(spliced)
    assert rate == 8000 and (dec == s).all()


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 40)
    with pytest.raises(ValueError):
        C.encode_wav(np.zeros(4, dtype=np.float32), 8000)  # wrong dtype


def test_rawv_round_trip():
    frames = np.arange(2 * 4 * 3 * 3, dtype=np.uint8).reshape(2, 4, 3, 3)
    enc = C.encode_rawv(frames, 250)
    assert len(enc) == C.rawv_size(3, 4, 2)
    interval, dec = C.decode_rawv(enc)
    assert interval == 250 and (dec == frames).all()


def test_rawv_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_rawv(b"RIFF but wrong magic and short")


def test_resize_nearest_exact_index_map():
    px = _pixels(100, 60)
    out = C.resize_nearest(px, 32, 32)
    assert out.shape == (32, 32, 3)
    for dy, dx in [(0, 0), (31, 31), (13, 29)]:
        assert (out[dy, dx] == px[(dy * 60) // 32, (dx * 100) // 32]).all()
    # upscale works too
    up = C.resize_nearest(px, 200, 120)
    assert up.shape == (120, 200, 3)
    assert (up[::2, ::2] == px).all()  # 2× nearest upscale replicates


# ------------------------------------------------------------------ PNG


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_with_filters(px: np.ndarray, filters: list[int], channels: int = 3) -> bytes:
    """Hand-assembled PNG whose row y uses filters[y % len] — forward
    filter math straight from RFC 2083 §6 (scalar reference, the
    decoder's oracle). channels: 1=gray, 3=RGB, 4=RGBA."""
    import struct
    import zlib

    h, w = px.shape[0], px.shape[1]
    color = {1: 0, 3: 2, 4: 6}[channels]
    raw = bytearray()
    prev = np.zeros((w, channels), dtype=np.int64)
    for y in range(h):
        ft = filters[y % len(filters)]
        raw.append(ft)
        cur = px[y].reshape(w, channels).astype(np.int64)
        z = np.zeros(channels, dtype=np.int64)
        for x in range(w):
            a = cur[x - 1] if x > 0 else z
            b = prev[x]
            c = prev[x - 1] if x > 0 else z
            if ft == 0:
                pred = z
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            raw.extend(((cur[x] - pred) % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (64, 64), (33, 17), (176, 128)])
def test_png_round_trip(w, h):
    px = _pixels(w, h)
    enc = C.encode_png(px)
    assert enc[:8] == b"\x89PNG\r\n\x1a\n"
    assert (C.decode_png(enc) == px).all()


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_each_filter_type(ft):
    px = _pixels(23, 9, seed=ft)
    assert (C.decode_png(_png_with_filters(px, [ft])) == px).all()


def test_png_mixed_filters_per_row():
    px = _pixels(40, 25, seed=11)
    enc = _png_with_filters(px, [0, 1, 2, 3, 4, 4, 3, 2, 1])
    assert (C.decode_png(enc) == px).all()


def test_png_gray_and_rgba_variants():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(7, 5, 1), dtype=np.uint8)
    out = C.decode_png(_png_with_filters(gray, [0, 2, 1], channels=1))
    assert out.shape == (7, 5, 3)
    assert (out == np.repeat(gray, 3, axis=2)).all()  # replicated to RGB
    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    out = C.decode_png(_png_with_filters(rgba, [4, 3], channels=4))
    assert (out == rgba[:, :, :3]).all()  # alpha dropped


def test_png_multiple_idat_chunks():
    import struct
    import zlib

    px = _pixels(16, 8, seed=5)
    enc = C.encode_png(px)
    # split the single IDAT into two chunks at an arbitrary byte
    sig, rest = enc[:8], enc[8:]
    size = struct.unpack_from(">I", rest, 0)[0]
    ihdr = rest[: 12 + size]
    rest = rest[12 + size :]
    size = struct.unpack_from(">I", rest, 0)[0]
    idat_body = rest[8 : 8 + size]
    iend = rest[12 + size :]
    cut = len(idat_body) // 2
    split = (
        sig
        + ihdr
        + _png_chunk(b"IDAT", idat_body[:cut])
        + _png_chunk(b"IDAT", idat_body[cut:])
        + iend
    )
    assert (C.decode_png(split) == px).all()


def test_png_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_png(b"definitely not a png")
    good = bytearray(C.encode_png(_pixels(4, 4)))
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        C.decode_png(bytes(bad_crc))
    # 16-bit depth is out of scope — must refuse, not garble
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        C.decode_png(deep)
    with pytest.raises(ValueError):
        C.encode_png(np.zeros((4, 4), dtype=np.uint8))  # no channel dim


def test_decode_image_dispatch():
    px = _pixels(12, 10)
    assert (C.decode_image(C.encode_bmp(px)) == px).all()
    assert (C.decode_image(C.encode_png(px)) == px).all()
    with pytest.raises(ValueError):
        C.decode_image(b"RAWV....")
