"""MJPEG-in-MP4: the ISO base-media container, pure stdlib+numpy.

ISO/IEC 14496-12 (ISO BMFF — the public MP4 spec): a box tree of
``ftyp`` + ``mdat`` (raw sample bytes) + ``moov`` carrying the sample
tables that make MP4 random-accessible — ``stts`` (decode deltas),
``stsz`` (sample sizes), ``stsc`` (samples per chunk), ``stco``
(chunk offsets into the FILE), ``stsd`` (the codec sample entry).
MP4 legitimately carries motion-JPEG: a ``jpeg`` VisualSampleEntry in
``stsd`` with each sample a standalone baseline JPEG — which is what
this module writes and reads, reusing functions/jpeg.py. So the THIRD
real interchange video container (after animated GIF and MJPEG-AVI)
decodes end-to-end with no external library; mp4 files whose ``stsd``
names any OTHER codec (avc1/hev1/mp4v …) keep the honest strict-mode
NotImplementedError — decoding H.264 genuinely needs ffmpeg.

Timestamps come from the container's own clock: ``mdhd.timescale``
ticks per second and the run-length ``stts`` delta table —
ts_ms(f) = (Σ deltas before f)·1000 // timescale. No wall-clock
metadata from the caller is trusted.

Error contract (shared with every codec in functions/): ANY malformed
or truncated payload raises ValueError — never IndexError/struct.error
— so mapInPandas callers can quarantine bad media per-row
(tests/test_codecs.py truncation sweep covers this file too).

Reference provenance: degdb (the reference) has no media surface; this
extends the multimodal training-pipeline family (SURVEY.md §2.6).
"""

from __future__ import annotations

import struct

import numpy as np

from degdb_spark.functions import jpeg

_TIMESCALE = 1000  # ms-granular clock for the encoder


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mp4_mjpeg(
    frames: np.ndarray,
    frame_interval_ms: int,
    quality: int = 50,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (N, H, W, 3) frame stack → ISO-BMFF bytes with one video
    track whose samples are baseline JPEGs (``jpeg`` sample entry).
    Layout: ftyp, mdat, moov — sample offsets in ``stco`` are absolute
    file offsets into the mdat body, one chunk per sample."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_mp4_mjpeg expects (N, H, W, 3) uint8")
    if frame_interval_ms <= 0:
        raise ValueError("frame_interval_ms must be positive")
    n, h, w, _ = frames.shape
    payloads = [
        jpeg.encode_jpeg(
            frames[f], quality=quality, subsample=True, restart_interval=restart_interval
        )
        for f in range(n)
    ]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_body = b"".join(payloads)
    # absolute chunk offsets: ftyp + mdat header precede the samples
    base = len(ftyp) + 8
    offsets, pos = [], base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    duration = n * frame_interval_ms  # in _TIMESCALE ticks (= ms)

    jpeg_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)  # SampleEntry: reserved + data_ref_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + jpeg_entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, frame_interval_ms))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(p)) for p in payloads))
    stco = _full(b"stco", struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"degdb\x00")
    mdhd = _full(
        b"mdhd", struct.pack(">IIII", 0, 0, _TIMESCALE, duration) + struct.pack(">HH", 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIII", 0, 0, 1, 0)  # times, track_id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
        flags=7,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_size) over ISO boxes in
    data[pos:end], loud on truncation (size 0 = to-end and size 1 =
    64-bit largesize are handled; anything overrunning raises)."""
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4 largesize box header truncated")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"mp4 box {btype!r} truncated")
        yield btype, pos + header, size - header
        pos += size
    if pos != end:
        raise ValueError("mp4 trailing garbage (truncated box header)")


def _find(data: bytes, pos: int, end: int, path: list[bytes]):
    """Body range of the first box at the given nested path."""
    for btype, s, z in _walk_boxes(data, pos, end):
        if btype == path[0]:
            if len(path) == 1:
                return s, s + z
            return _find(data, s, s + z, path[1:])
    raise ValueError(f"mp4 missing {b'/'.join(path)!r} box")


def _full_body(data: bytes, s: int, e: int) -> int:
    if e - s < 4:
        raise ValueError("mp4 full-box body truncated")
    return s + 4  # skip version+flags


def decode_mp4_clock(data: bytes) -> tuple[int, list[int], list[np.ndarray]]:
    """ISO-BMFF MJPEG bytes → (timescale, [per-frame tick offsets],
    [uint8 (H, W, 3) frames]). Walks moov/trak/mdia for the first
    video track; requires the ``stsd`` sample entry to be ``jpeg``
    (raises NotImplementedError naming the codec otherwise — H.264 et
    al. genuinely need ffmpeg); reads the stts/stsz/stsc/stco tables
    and decodes each sample from its absolute file offset.

    Error split: STRUCTURAL damage (truncated boxes/tables, overrun
    samples, trailing garbage) raises ValueError — the quarantine
    contract; VALID-but-unsupported shapes (non-MJPEG codec, no video
    track, fragmented mp4 without sample tables) raise
    NotImplementedError — the honest gate, so a permissive pipeline
    can route e.g. an m4a to the fake-feature fallback instead of
    killing the whole Arrow batch."""
    timescale, deltas, frames = _parse_mp4(data)
    ticks, acc = [], 0
    for d in deltas:
        ticks.append(acc)
        acc += d
    return timescale, ticks, frames


def decode_mp4(data: bytes) -> tuple[int, list[np.ndarray]]:
    """Summary view: (frame_interval_ms, frames) — the FIRST stts delta
    scaled to ms (well-defined even for a single-frame file, so the
    feature interval stays container-invariant vs the AVI/RAWV twins).
    Exact per-frame timestamps via decode_mp4_clock."""
    timescale, deltas, frames = _parse_mp4(data)
    interval = deltas[0] * 1000 // timescale if deltas else 0
    return interval, frames


def _table(data: bytes, boxes: dict, name: bytes, fixed_hdr: int) -> tuple[int, int]:
    """Body start of full-box ``name`` with its box-LOCAL end — every
    table read below is bounds-checked against the enclosing box, not
    the whole buffer, so an undersized box raises ValueError instead
    of leaking struct.error or silently parsing the neighbor's bytes."""
    s, z = boxes[name]
    b = _full_body(data, s, s + z)
    if s + z < b + fixed_hdr:
        raise ValueError(f"mp4 {name.decode()} truncated")
    return b, s + z


def _parse_mp4(data: bytes) -> tuple[int, list[int], list[np.ndarray]]:
    if len(data) < 12:
        raise ValueError("not an mp4 payload")
    # validate the top-level walk & ftyp presence up front
    tops = list(_walk_boxes(data, 0, len(data)))
    if not any(t == b"ftyp" for t, _, _ in tops):
        raise ValueError("not an mp4 payload (no ftyp)")
    moov = [(s, z) for t, s, z in tops if t == b"moov"]
    if not moov:
        raise ValueError("mp4 missing moov")
    ms, mz = moov[0]
    # first video trak
    for btype, ts_, tz in _walk_boxes(data, ms, ms + mz):
        if btype != b"trak":
            continue
        try:
            hs, he = _find(data, ts_, ts_ + tz, [b"mdia", b"hdlr"])
        except ValueError:
            continue
        if data[_full_body(data, hs, he) + 4 : _full_body(data, hs, he) + 8] != b"vide":
            continue
        mdhd_s, mdhd_e = _find(data, ts_, ts_ + tz, [b"mdia", b"mdhd"])
        b = _full_body(data, mdhd_s, mdhd_e)
        version = data[mdhd_s]
        need = 32 if version == 1 else 20
        if mdhd_e < b + need:
            raise ValueError("mp4 mdhd truncated")
        timescale = struct.unpack_from(">I", data, b + (16 if version == 1 else 8))[0]
        if timescale == 0:
            raise ValueError("mp4 mdhd timescale must be nonzero")
        try:
            stbl_s, stbl_e = _find(data, ts_, ts_ + tz, [b"mdia", b"minf", b"stbl"])
        except ValueError:
            # a video trak without sample tables = fragmented mp4
            # (moof-carried samples) — valid format, unsupported shape
            raise NotImplementedError(
                "fragmented mp4 (no stbl sample tables) needs ffmpeg"
            ) from None
        boxes = {t: (s, z) for t, s, z in _walk_boxes(data, stbl_s, stbl_e)}
        missing = [n for n in (b"stsd", b"stts", b"stsz", b"stco") if n not in boxes]
        if missing:
            raise NotImplementedError(
                f"mp4 without {missing[0].decode()} sample table (fragmented/"
                "non-standard layout) needs ffmpeg"
            )
        # codec gate
        s, z = boxes[b"stsd"]
        entry_s = _full_body(data, s, s + z) + 4  # skip entry_count
        if s + z < entry_s + 8:
            raise ValueError("mp4 stsd truncated")
        fourcc = data[entry_s + 4 : entry_s + 8]
        if fourcc != b"jpeg":
            raise NotImplementedError(
                f"mp4 codec {fourcc!r} needs ffmpeg (only 'jpeg' MJPEG "
                "tracks decode in-container)"
            )
        # stsz first: its sample count bounds the stts expansion below
        b, end = _table(data, boxes, b"stsz", 8)
        fixed, n_samples = struct.unpack_from(">II", data, b)
        if n_samples == 0:
            # present-but-empty sample tables = the fragmented/DASH
            # layout (samples live in moof fragments) — valid format,
            # unsupported shape, NOT structural damage
            raise NotImplementedError(
                "fragmented mp4 (empty stbl sample tables) needs ffmpeg"
            )
        # a sample is ≥1 byte of mdat, so n_samples > len(data) is
        # structurally impossible — reject BEFORE any allocation (an
        # attacker-controlled 32-bit count could otherwise balloon a
        # multi-GB size list on the fixed-size path)
        if n_samples > len(data):
            raise ValueError("mp4 stsz declares more samples than the payload holds")
        if fixed:
            sizes = [fixed] * n_samples
        else:
            if end < b + 8 + 4 * n_samples:
                raise ValueError("mp4 stsz truncated")
            sizes = list(struct.unpack_from(f">{n_samples}I", data, b + 8))
        # stts: run-length (count, delta) pairs → per-sample deltas.
        # Run counts are attacker-controlled: cap the expansion at the
        # (already-bounded) stsz sample count
        b, end = _table(data, boxes, b"stts", 4)
        (n_runs,) = struct.unpack_from(">I", data, b)
        if end < b + 4 + 8 * n_runs:
            raise ValueError("mp4 stts truncated")
        deltas: list[int] = []
        for r in range(n_runs):
            cnt, delta = struct.unpack_from(">II", data, b + 4 + 8 * r)
            if len(deltas) + cnt > n_samples:
                raise ValueError("mp4 stts declares more samples than stsz")
            deltas.extend([delta] * cnt)
        if len(deltas) != n_samples:
            raise ValueError("mp4 stts/stsz sample-count mismatch")
        # stco chunk offsets
        b, end = _table(data, boxes, b"stco", 4)
        (n_chunks,) = struct.unpack_from(">I", data, b)
        if end < b + 4 + 4 * n_chunks:
            raise ValueError("mp4 stco truncated")
        chunk_offs = list(struct.unpack_from(f">{n_chunks}I", data, b + 4))
        # stsc: (first_chunk, samples_per_chunk, desc) runs — chunk ci
        # uses the spc of the LAST entry with first_chunk <= ci (the
        # spec's run-length semantics; this encoder writes one entry
        # but third-party files legitimately vary chunking)
        stsc_entries: list[tuple[int, int]] = [(1, 1)]
        if b"stsc" in boxes:
            b, end = _table(data, boxes, b"stsc", 4)
            (n_ent,) = struct.unpack_from(">I", data, b)
            if end < b + 4 + 12 * n_ent:
                raise ValueError("mp4 stsc truncated")
            if n_ent >= 1:
                stsc_entries = []
                for i in range(n_ent):
                    first, spc, _desc = struct.unpack_from(">III", data, b + 4 + 12 * i)
                    stsc_entries.append((first, spc))
                # ISO 14496-12: the runs must start at chunk 1 and be
                # strictly ascending — anything else leaves chunks with
                # a guessed samples-per-chunk, i.e. silent mis-decode
                if stsc_entries[0][0] != 1 or any(
                    stsc_entries[i][0] >= stsc_entries[i + 1][0]
                    for i in range(len(stsc_entries) - 1)
                ):
                    raise ValueError(
                        "mp4 stsc runs must start at chunk 1 and ascend"
                    )
        frames: list[np.ndarray] = []
        si, ei = 0, 0
        for ci in range(1, n_chunks + 1):
            while ei + 1 < len(stsc_entries) and stsc_entries[ei + 1][0] <= ci:
                ei += 1
            off = chunk_offs[ci - 1]
            for _ in range(stsc_entries[ei][1]):
                if si >= n_samples:
                    break
                sz = sizes[si]
                if off + sz > len(data):
                    raise ValueError("mp4 sample extends past payload (truncated)")
                frames.append(jpeg.decode_jpeg(data[off : off + sz]))
                off += sz
                si += 1
        if si != n_samples:
            raise ValueError("mp4 chunk tables cover fewer samples than declared")
        return timescale, deltas, frames
    raise NotImplementedError(
        "mp4 has no video track (audio-only/m4a needs librosa/ffmpeg)"
    )
