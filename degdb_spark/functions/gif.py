"""Pure-Python GIF (87a/89a) encoder and decoder.

GIF rounds out the real-format image codecs (BMP/PNG/JPEG in
functions/codecs.py and functions/jpeg.py): it is the web's dominant
legacy/animation format, it needs nothing beyond the stdlib (LZW is
~60 lines), and — unlike JPEG — it is LOSSLESS for palettized content,
so round trips are bit-exact whenever an image has ≤256 distinct
colors. That makes the contract oracle trivial: any ≤256-color
closed-form pattern must survive encode→decode unchanged.

Scope:

- encode: single-frame GIF89a from an RGB image with ≤256 distinct
  colors (the honest constraint — real GIF is palettized; an encoder
  that silently quantized would make round-trip tests meaningless),
  and ANIMATED GIF89a from a frame stack (encode_gif_frames: one
  graphic-control delay + local color table per frame). Full LZW with
  dictionary resets at 4096 codes.
- decode: GIF87a/89a, global and local color tables, interlaced and
  non-interlaced frames, graphic-control/comment/application
  extensions skipped, variable-width LZW with deferred clear codes.
  Multi-frame (animated) files: ``decode_gif`` renders the FIRST
  frame onto the logical screen; ``decode_gif_frames`` yields every
  frame's rendered RGB for frame-level operators; ``decode_gif_video``
  also returns per-frame delays for the video seam
  (operators/multimodal.extract_video_frames). Transparency is
  ignored (pixels take their palette color) — this seam feeds pixel
  statistics and perceptual hashing, not compositing.

Reference provenance: degdb has no media surface; this extends the
"multimodal columns" requirement of the training-pipeline extension
(SURVEY.md §2.6). Format facts from the public GIF89a specification
(CompuServe, 1990).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF variable-width LZW → list of palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # stream ended without END code — tolerate
            acc |= data[pos] << nbits  # LSB-first per GIF
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            if len(dictionary) < 4096:  # deferred clear: stop growing at 12 bits
                dictionary.append(prev + [entry[0]])
        elif code == len(dictionary) and len(dictionary) < 4096:  # KwKwK
            entry = prev + [prev[0]]
            dictionary.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code beyond dictionary)")
        out.extend(entry)
        prev = entry
        # widen BEFORE the next read once the next append would overflow
        if len(dictionary) >= (1 << width) and width < 12:
            width += 1


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices → GIF variable-width LZW bytes (with the
    spec-required leading clear code and dictionary resets at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    dictionary: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prev: tuple[int, ...] = ()
    for ix in indices.tolist():
        cand = prev + (ix,)
        if cand in dictionary:
            prev = cand
            continue
        emit(dictionary[prev], width)
        if next_code >= 4096:  # table full: clear BEFORE assigning code 4096
            emit(clear, width)
            dictionary = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        else:
            dictionary[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        prev = (ix,)
    if prev:
        emit(dictionary[prev], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- codec


def encode_gif(pixels: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) with ≤256 distinct colors → single-frame
    GIF89a bytes (local color table — same frame writer the animated
    encoder uses). Raises if the palette would overflow — GIF is a
    palettized format and silent quantization would break the
    lossless round-trip contract."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_gif expects (H, W, 3) uint8")
    h, w, _ = pixels.shape
    try:
        frame = _frame_blocks(pixels)
    except ValueError as e:
        raise ValueError(f"encode_gif: {e}") from e
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
        + frame
        + b"\x3b"
    )


def _palettize(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(table, indices, ct_bits) for one ≤256-color frame."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"GIF frame has {n_colors} distinct colors (caps at 256)")
    ct_bits = max(1, int(np.ceil(np.log2(max(2, n_colors)))))
    table = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    table[:n_colors] = palette
    return table, indices.reshape(h, w), ct_bits


def _frame_blocks(pixels: np.ndarray, left: int = 0, top: int = 0) -> bytes:
    """Image descriptor + LOCAL color table + LZW sub-blocks for one
    frame (local tables per frame, so an animation's frames don't have
    to share one 256-color budget)."""
    h, w, _ = pixels.shape
    table, idx, ct_bits = _palettize(pixels)
    min_code_size = max(2, ct_bits)
    lzw = _lzw_encode(idx.reshape(-1).astype(np.int64), min_code_size)
    out = bytearray()
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0x80 | (ct_bits - 1))
    out += table.tobytes()
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_frames(frames: np.ndarray, frame_interval_ms: int) -> bytes:
    """(F, H, W, 3) uint8 frame stack → ANIMATED GIF89a bytes: one
    graphic-control extension (delay in centiseconds) + image
    descriptor with a local color table per frame. Each frame must be
    ≤256 colors (same honest constraint as encode_gif). This makes
    animated GIF the REAL video container behind the frame-extraction
    seam — the toy RAWV stays only as the raw-RGB24 stand-in for
    formats that genuinely need ffmpeg."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_gif_frames expects (F, H, W, 3) uint8")
    if frames.shape[0] == 0:
        raise ValueError("encode_gif_frames expects at least one frame")
    _, h, w, _ = frames.shape
    delay_cs = max(0, int(frame_interval_ms) // 10)
    if delay_cs > 0xFFFF:
        raise ValueError(
            f"frame_interval_ms={frame_interval_ms} overflows GIF's 16-bit "
            "centisecond delay (max 655350 ms)"
        )
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    for f in range(frames.shape[0]):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += _frame_blocks(frames[f])
    out += b"\x3b"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def _parse_frames(data: bytes):
    """Yield (left, top, w, h, rgb_frame) per image descriptor.

    Iterate via _frames_checked (the public decoders do): raw iteration
    surfaces IndexError/struct.error on truncated payloads, and the
    codec contract is ValueError for ANY malformed input — callers
    quarantine bad media by catching ValueError, and a leaked
    IndexError would kill a whole mapInPandas batch instead."""
    if data[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    delay_ms = 0  # from the most recent graphic-control extension
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 3:
                # graphic control: packed, delay u16le (centiseconds),
                # transparent index — we keep the delay for the video seam
                delay_ms = (data[pos + 2] | (data[pos + 3] << 8)) * 10
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            table = global_table
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code_size)
            if len(indices) < w * h:
                raise ValueError("GIF frame pixel data truncated")
            idx = np.asarray(indices[: w * h], dtype=np.int64).reshape(h, w)
            if idx.max(initial=0) >= len(table):
                raise ValueError("GIF index outside color table")
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            yield left, top, w, h, table[idx], delay_ms
            delay_ms = 0  # a GCE applies to ONE following frame
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")


def _frames_checked(data: bytes):
    """_parse_frames with the ValueError contract enforced: truncation
    anywhere in the block walk maps to ValueError, never IndexError."""
    it = _parse_frames(data)
    while True:
        try:
            yield next(it)
        except StopIteration:
            return
        except (IndexError, struct.error) as e:
            raise ValueError("GIF payload truncated or corrupt") from e


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → RGB uint8 (H, W, 3) of the FIRST frame rendered on
    the logical screen (undrawn area, if the frame is smaller, stays
    black)."""
    return decode_gif_video(data)[1][0]


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """All frames, each rendered independently on the logical screen —
    the frame-level seam for animated inputs (no inter-frame disposal
    compositing: this feeds per-frame stats/hashing, not playback)."""
    return decode_gif_video(data)[1]


def decode_gif_video(data: bytes) -> tuple[list[int], list[np.ndarray]]:
    """Animated GIF → (per-frame delay_ms list, rendered frames). The
    decode seam extract_video_frames uses: frame f's timestamp is the
    cumulative sum of the delays BEFORE it (frame 0 shows at t=0; its
    own delay is how long it stays up)."""
    sw, sh = (
        struct.unpack_from("<HH", data, 6)
        if data[:6] in _GIF_MAGICS and len(data) >= 13
        else (0, 0)
    )
    delays: list[int] = []
    frames: list[np.ndarray] = []
    for left, top, w, h, rgb, delay in _frames_checked(data):
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)
        screen[top : top + h, left : left + w] = rgb
        frames.append(screen)
        delays.append(delay)
    if not frames:
        raise ValueError("GIF contains no image frame")
    return delays, frames
