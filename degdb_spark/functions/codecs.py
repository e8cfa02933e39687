"""Pure-numpy media codecs for real (public, uncompressed) formats.

The container has no PIL/librosa/ffmpeg, but two ubiquitous formats
need nothing beyond struct + numpy:

- BMP (Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up rows
  padded to 4 bytes) — the simplest widely-readable image container.
- WAV (RIFF/WAVE, PCM 16-bit) — the standard uncompressed audio
  container.

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


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM samples → RIFF/WAVE bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    payload = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(payload)) + payload


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes → (sample_rate, int16 samples).
    Walks RIFF chunks, so extra chunks (LIST etc.) are tolerated."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM16 mono)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, samples


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
