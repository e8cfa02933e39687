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
