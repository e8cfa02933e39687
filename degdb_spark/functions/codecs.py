"""Pure-numpy media codecs for real (public, uncompressed) formats.

The container has no PIL/librosa/ffmpeg, but two ubiquitous formats
need nothing beyond struct + numpy:

- BMP (Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up rows
  padded to 4 bytes) — the simplest widely-readable image container.
- PNG (RFC 2083: chunked container, zlib-inflated scanlines, the five
  row filters None/Sub/Up/Average/Paeth) — the most common lossless
  image format a real multimodal pipeline ingests; stdlib ``zlib``
  covers the compression so no third-party dependency is needed.
  Decode supports bit-depth-8 gray/RGB/RGBA, encode emits truecolor.
- WAV (RIFF/WAVE) — PCM 16-bit, the standard uncompressed audio
  container, plus G.711 mu-law (format tag 7) and A-law (format tag
  6) — the two standard telephony codings, expanded to int16 on
  decode.

Plus one explicitly-toy container for video plumbing:

- RAWV — ``b"RAWV" + u32 width + u32 height + u32 n_frames + u32
  frame_interval_ms`` followed by n_frames raw RGB24 frames. NOT a real
  interchange format; it exists so frame extraction / per-frame decode
  has real bytes to operate on (a real deployment swaps in ffmpeg at
  exactly this seam).

These are the decode bodies behind operators/multimodal.py — payloads
produced here open in any external viewer, and the decoders reject
malformed input instead of guessing.

Reference provenance: degdb has no media surface; this implements the
"multimodal columns" requirement of the training-pipeline extension
(SURVEY.md §2.6) with real codecs instead of a stub.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ------------------------------------------------------------------ BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) → 24-bit BI_RGB BMP bytes (bottom-up, rows
    padded to 4 bytes, BGR byte order per the format)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = pixels.shape
    row_stride = (3 * w + 3) // 4 * 4
    img_size = row_stride * h
    file_size = 54 + img_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → RGB uint8 (H, W, 3)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row_stride = (3 * w + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=row_stride * h, offset=pixel_off)
    rows = raw.reshape(h, row_stride)[:, : 3 * w].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the common case)
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format sniff for EVERY native codec — the single
    magic table. decode_image routes by it and so does the multimodal
    operator layer (operators/multimodal.py::_sniff_format delegates
    here), so a codec added in one place can never silently fall
    through to the fake-feature path in the other."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if len(data) >= 8 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"RAWV":
        return "rawv"
    # mp3 LAST: its 11-bit frame sync (0xFFE) is the weakest magic
    # (JPEG's 0xFFD8FF already matched above); ID3v2 tags are mp3-family
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Format-sniffing image decode: BMP, PNG, baseline JPEG or GIF
    bytes → RGB uint8 (H, W, 3). The single seam every image operator
    goes through, so adding a codec here lights it up everywhere
    (pixel stats, aHash, resize, features)."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        from degdb_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":
        from degdb_spark.functions.gif import decode_gif

        return decode_gif(data)
    raise ValueError("unrecognized image payload (expected BMP, PNG, JPEG or GIF)")


def decode_video_frames(data: bytes) -> tuple[list[int], list[np.ndarray]]:
    """Format-sniffing video decode: animated GIF, MJPEG-AVI,
    MJPEG-MP4 or RAWV bytes → ([per-frame timestamp ms], [RGB uint8
    (H, W, 3) frames]). The video twin of decode_image — the single
    seam every video operator (frame extraction, video aHash, feature
    extraction) goes through, so adding a container here lights it up
    everywhere. Timestamps come from each container's OWN clock: GIF
    graphic-control delays (ts(f) = Σ delays[:f]), AVI dwScale/dwRate,
    MP4 mdhd timescale + stts deltas, RAWV's fixed interval header.
    An mp4 whose track codec is not MJPEG raises NotImplementedError
    (H.264 et al. genuinely need ffmpeg)."""
    fmt = sniff_format(data)
    if fmt == "gif":
        from degdb_spark.functions.gif import decode_gif_video

        delays, frames = decode_gif_video(data)
        ts, acc = [], 0
        for d in delays:
            ts.append(acc)
            acc += d
        return ts, frames
    if fmt == "avi":
        from degdb_spark.functions.avi import decode_avi_clock, frame_timestamps_ms

        scale, rate, frames = decode_avi_clock(data)
        # exact container clock: f·1000·scale // rate — NOT f·interval,
        # which drifts when rate ∤ 1000·scale (NTSC 1001/30000)
        return frame_timestamps_ms(scale, rate, len(frames)), frames
    if fmt == "mp4":
        from degdb_spark.functions.mp4 import decode_mp4_clock

        timescale, ticks, frames = decode_mp4_clock(data)
        return [t * 1000 // timescale for t in ticks], frames
    if fmt == "rawv":
        interval, stack = decode_rawv(data)
        return (
            [f * interval for f in range(stack.shape[0])],
            [stack[f] for f in range(stack.shape[0])],
        )
    raise ValueError("unrecognized video payload (expected GIF, AVI or RAWV)")


def bmp_size(width: int, height: int) -> int:
    """Encoded byte size — 54-byte headers + padded rows. Mirrored in
    contract-query oracle SQL (queries/multimodal_queries.py)."""
    return 54 + height * ((3 * width + 3) // 4 * 4)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with floor(dst·src/out) index mapping —
    exact integer arithmetic, so an SQL oracle can replay pixel picks."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[np.ix_(ys, xs)]


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) → 8-bit truecolor PNG bytes (color type 2,
    no interlace, filter 0 on every row, stdlib-zlib deflate). Opens in
    any external viewer; decode_png round-trips it bit-exactly."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = np.zeros((h, 1 + 3 * w), dtype=np.uint8)
    rows[:, 1:] = pixels.reshape(h, 3 * w)  # leading 0 = filter None
    idat = zlib.compress(rows.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """8-bit PNG bytes → RGB uint8 (H, W, 3), pure stdlib zlib + numpy.

    Walks chunks (CRC-validated), inflates the concatenated IDAT
    stream, and undoes the five PNG row filters — None/Sub/Up/Average/
    Paeth (RFC 2083 §6). Supported shapes: bit depth 8, color types 0
    (grayscale, replicated to RGB), 2 (RGB), 6 (RGBA, alpha dropped),
    no interlace — what a real training corpus overwhelmingly carries;
    anything else raises rather than guesses. Sub is vectorized as a
    per-channel-lane cumulative sum; Average/Paeth are left-dependent
    so they run one vectorized step per PIXEL (not per byte)."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + size > len(data):
            # truncation is ValueError like every other malformed case —
            # callers quarantine bad media by catching ValueError
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        body = data[pos + 8 : pos + 8 + size]
        crc = struct.unpack_from(">I", data, pos + 8 + size)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or color not in (0, 2, 6):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(scan[y, 0])
        line = scan[y, 1:].astype(np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub — running sum down each channel lane
            cur = (
                np.cumsum(line.reshape(w, ch), axis=0, dtype=np.int64) % 256
            ).reshape(stride).astype(np.int32)
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth — left-dependent
            px = line.reshape(w, ch)
            pv = prev.reshape(w, ch)
            cv = np.zeros((w, ch), dtype=np.int32)
            a = np.zeros(ch, dtype=np.int32)  # left
            c = np.zeros(ch, dtype=np.int32)  # upper-left
            for x in range(w):
                b = pv[x]  # up
                if ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                cv[x] = (px[x] + pred) % 256
                a = cv[x]
                c = b
            cur = cv.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM samples → RIFF/WAVE bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    payload = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(payload)) + payload


#: G.711 mu-law constants (public ITU-T G.711 spec)
_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray, sun_compat: bool = False) -> np.ndarray:
    """int16 PCM → uint8 G.711 mu-law codes, vectorized integer math
    (segment = position of the leading bit of the biased magnitude,
    4-bit mantissa below it, ones-complement output per the spec).

    Boundary rounding (default form): negative values exactly on
    segment boundaries encode one code up from the Sun g711.c/audioop
    encoder (381 of 65536 inputs, e.g. -31611 → 0x01 vs Sun's 0x00).
    Deliberate: round-trip stays idempotent, ``ulaw_decode`` matches
    audioop bit-exactly, and reconstruction error is slightly LOWER
    than the Sun form. When BYTE parity with externally encoded
    fixtures matters, pass ``sun_compat=True`` for the exact Sun
    14-bit-shift algorithm (bit-identical to audioop.lin2ulaw on all
    65536 inputs — property-tested)."""
    x = samples.astype(np.int64)
    if sun_compat:
        # the Sun g711.c form: drop to 14 bits FIRST, negate after —
        # that truncation order is where the 381 boundary codes differ
        x14 = x >> 2
        mask = np.where(x14 < 0, 0x7F, 0xFF)
        mag = np.minimum(np.where(x14 < 0, -x14, x14), 8159) + 33
        seg = np.zeros_like(mag)  # bit_length(mag >> 6), capped at 8
        for e in range(8, 0, -1):
            seg = np.where((mag >> (e + 5)) & 1 == 1, np.maximum(seg, e), seg)
        uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
        out = np.where(seg >= 8, 0x7F, uval) ^ mask
        return (out & 0xFF).astype(np.uint8)
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    # exponent: index of the highest set bit in mag >> 7 (0..7)
    exp = np.zeros_like(mag)
    for e in range(7, 0, -1):
        exp = np.where((mag >> (e + 7)) & 1 == 1, np.maximum(exp, e), exp)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law codes → int16 PCM (the exact spec expansion;
    decode(encode(x)) is the canonical mu-law quantization of x)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → uint8 G.711 A-law codes (the European telephony
    sibling of mu-law), the classic public-domain g711.c form
    vectorized: 13-bit input, 8 segments, 0x55/0xD5 xor masks."""
    x13 = samples.astype(np.int64) >> 3  # arithmetic shift to 13 bits
    mask = np.where(x13 >= 0, 0xD5, 0x55)
    v = np.where(x13 >= 0, x13, -x13 - 1)
    seg = np.zeros_like(v)
    for bound in (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF):
        seg += (v > bound).astype(np.int64)
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((v >> shift) & 0x0F)
    return ((np.where(seg >= 8, 0x7F, aval)) ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 A-law codes → int16 PCM (g711.c expansion: segment
    midpoints in the 16-bit domain; the sign bit AFTER the 0x55 xor
    marks POSITIVE values)."""
    a = codes.astype(np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_wav_alaw(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE bytes with G.711 A-law coding
    (format tag 6, 8 bits/sample)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_alaw expects 1-D int16 samples")
    data = alaw_encode(samples).tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 6, 1, sample_rate, sample_rate, 1, 8)
    payload = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(payload)) + payload


def encode_wav_ulaw(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE bytes with G.711 mu-law coding
    (format tag 7, 8 bits/sample — the standard telephony container)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_ulaw expects 1-D int16 samples")
    data = ulaw_encode(samples).tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 7, 1, sample_rate, sample_rate, 1, 8)
    payload = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(payload)) + payload


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """THE audio decode seam: (sample_rate, int16 MONO samples) from
    any supported audio container — RIFF/WAVE (PCM16, G.711 A/mu-law,
    IMA ADPCM, stereo) via decode_wav, or FLAC (functions/flac.py)
    sniffed on its fLaC magic. Every audio operator (stats, features,
    DTMF, fingerprints) ingests through here, so a codec added in this
    one dispatch reaches all of them at once."""
    if data[:4] == b"fLaC":
        from degdb_spark.functions import flac

        return flac.decode_flac(data)
    return decode_wav(data)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, int16 MONO samples): PCM16
    (format 1), G.711 A-law (format 6), G.711 mu-law (format 7), or
    IMA/DVI ADPCM (format 0x11, functions/adpcm.py) — the compressed
    variants expanded to int16. The ADPCM fact chunk, when present,
    trims final-block encoder padding to the true sample count.

    Stereo PCM16/G.711 is DOWNMIXED to mono as floor((L+R)/2) — the
    exact int16-safe average (documented floor: −3//2 = −2), so every
    downstream operator (stats, features, DTMF, fingerprints) ingests
    2-channel files without a separate path. Stereo IMA ADPCM (two
    interleaved 4-byte-word streams) stays a named ValueError gate.
    Walks RIFF chunks, so extra chunks (LIST etc.) are tolerated."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, samples, fact = 12, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if pos + 8 + size > len(data):
            # a short chunk must fail LOUDLY: a silently shortened
            # `data` chunk would hand back fewer samples than the file
            # declares — truncated audio masquerading as complete
            raise ValueError(f"WAV chunk {cid!r} truncated")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                # must be ValueError, not struct.error from the
                # unpack_from below: the quarantine seams
                # (validate_media & friends) catch only ValueError,
                # so a struct.error would abort the whole stage
                raise ValueError("WAV fmt chunk too small")
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            block_align = struct.unpack_from("<H", body, 12)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
            if (audio_fmt, bits) not in ((1, 16), (6, 8), (7, 8), (0x11, 4)):
                raise ValueError(
                    "unsupported WAV variant (need PCM16, A-law, mu-law "
                    "or IMA ADPCM)"
                )
            if channels == 2 and audio_fmt == 0x11:
                raise ValueError(
                    "stereo IMA ADPCM (interleaved per-channel word "
                    "streams) is not supported — mono only"
                )
            if channels not in (1, 2):
                raise ValueError(f"unsupported WAV channel count {channels}")
        elif cid == b"fact":
            if size < 4:
                raise ValueError("WAV fact chunk too small")
            fact = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            raw = body  # fmt chunk may follow data in odd writers: defer
            samples = raw
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt == 0x11:
        from degdb_spark.functions import adpcm

        return sample_rate, adpcm.decode_ima_blocks(samples, block_align, fact)
    if audio_fmt == 7:
        s = ulaw_decode(np.frombuffer(samples, dtype=np.uint8))
    elif audio_fmt == 6:
        s = alaw_decode(np.frombuffer(samples, dtype=np.uint8))
    else:
        s = np.frombuffer(samples, dtype="<i2").astype(np.int16)
    if channels == 2:
        if s.size % 2:
            raise ValueError("stereo WAV data holds a half frame (truncated)")
        # floor average in int32 space: int16 + int16 cannot overflow
        mix = (s[0::2].astype(np.int32) + s[1::2].astype(np.int32)) // 2
        return sample_rate, mix.astype(np.int16)
    return sample_rate, s


def encode_wav_stereo(
    left: np.ndarray, right: np.ndarray, sample_rate: int
) -> bytes:
    """Two int16 channels → interleaved stereo PCM16 WAV bytes (the
    fixture twin for the stereo downmix path)."""
    if (
        left.dtype != np.int16 or right.dtype != np.int16
        or left.ndim != 1 or left.shape != right.shape
    ):
        raise ValueError("encode_wav_stereo expects two equal-length 1-D int16 arrays")
    inter = np.empty(left.size * 2, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    data = inter.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 2, sample_rate, sample_rate * 4, 4, 16
    )
    payload = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(payload)) + payload


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 64
) -> bytes:
    """int16 samples → mono IMA/DVI ADPCM WAV bytes (format tag 0x11,
    4 bits/sample, functions/adpcm.py block codec). Writes the fact
    chunk so decoders trim the final block's padding to the true
    sample count."""
    from degdb_spark.functions import adpcm

    if samples.dtype != np.int16 or samples.ndim != 1 or samples.size == 0:
        raise ValueError("encode_wav_adpcm expects non-empty 1-D int16 samples")
    data = adpcm.encode_ima_blocks(samples, block_align)
    spb = adpcm.samples_per_block(block_align)
    avg_bps = sample_rate * block_align // spb
    fmt = struct.pack(
        "<4sIHHIIHHHH",
        b"fmt ", 20, 0x11, 1, sample_rate, avg_bps, block_align, 4, 2, spb,
    )
    fact = struct.pack("<4sII", b"fact", 4, samples.size)
    payload = b"WAVE" + fmt + fact + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(payload)) + payload


def wav_size(n_samples: int) -> int:
    """Encoded byte size: 44-byte canonical header + 2 bytes/sample."""
    return 44 + 2 * n_samples


# ----------------------------------------------------------------- RAWV


def encode_rawv(frames: np.ndarray, frame_interval_ms: int) -> bytes:
    """uint8 (N, H, W, 3) frame stack → toy RAWV container bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_rawv expects (N, H, W, 3) uint8")
    n, h, w, _ = frames.shape
    return struct.pack("<4sIIII", b"RAWV", w, h, n, frame_interval_ms) + frames.tobytes()


def decode_rawv(data: bytes) -> tuple[int, np.ndarray]:
    """RAWV bytes → (frame_interval_ms, uint8 (N, H, W, 3) frames)."""
    if len(data) < 20 or data[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    _, w, h, n, interval = struct.unpack_from("<4sIIII", data, 0)
    frames = np.frombuffer(data, dtype=np.uint8, count=n * h * w * 3, offset=20)
    return interval, frames.reshape(n, h, w, 3)


def rawv_size(width: int, height: int, n_frames: int) -> int:
    """Encoded byte size: 20-byte header + raw RGB24 frames."""
    return 20 + n_frames * width * height * 3
