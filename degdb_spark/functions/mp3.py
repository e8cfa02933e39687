"""MP3 metadata probe: header walk, NO sample decode.

ISO/IEC 11172-3 (MPEG-1 audio) frame headers are self-describing: 11
sync bits, version/layer fields, a bitrate index and a sample-rate
index, and a padding bit that together determine the frame's byte
length — so duration, bitrate and frame count are recoverable by
WALKING headers without decoding a single sample. That is exactly the
split real tooling makes (ffprobe vs ffmpeg), and the split this repo
keeps: `probe_mp3` is real; sample DECODE stays behind the strict-mode
NotImplementedError (a Layer-III synthesis filterbank genuinely wants
a native library).

Scope: MPEG-1 Layer III CBR/VBR frame walking with an optional leading
ID3v2 tag (syncsafe size skip). Free-format (bitrate index 0) and
reserved indices raise; a frame that overruns the payload raises —
the same loud-truncation quarantine contract as every codec here.

Reference provenance: degdb (the reference) has no media surface; this
extends the multimodal training-pipeline family (SURVEY.md §2.6).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

#: MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free, 15 = bad)
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
#: MPEG-1 sample rates by 2-bit index (3 = reserved)
_SAMPLE_RATES_V1 = [44100, 48000, 32000]
_SAMPLES_PER_FRAME_V1_L3 = 1152


class Mp3Info(NamedTuple):
    bitrate_kbps: int  # of the FIRST frame (CBR assumption for the summary)
    sample_rate: int
    n_frames: int
    duration_ms: int  # Σ per-frame samples / sample_rate, exact integer math


def _skip_id3v2(data: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (syncsafe 28-bit size), 0
    when absent; a declared tag overrunning the payload raises. The
    v2.4 footer flag (0x10) appends 10 bytes NOT counted in the
    syncsafe size — skipped too, or the frame walk would land on the
    '3DI' footer and report lost sync on a valid file."""
    if data[:3] != b"ID3":
        return 0
    if len(data) < 10:
        raise ValueError("mp3 ID3v2 header truncated")
    b = data[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("mp3 ID3v2 size bytes must be syncsafe")
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    end = 10 + size + (10 if data[5] & 0x10 else 0)
    if end > len(data):
        raise ValueError("mp3 ID3v2 tag overruns payload (truncated)")
    return end


def probe_mp3(data: bytes) -> Mp3Info:
    """Walk every MPEG-1 Layer III frame header in ``data`` →
    Mp3Info. Per-frame length = 144·bitrate//sample_rate + padding
    (the spec's Layer II/III formula); duration sums exactly in
    integer math as Σ 1152·1000 // sample_rate per frame... computed
    as total_samples·1000 // sample_rate to avoid per-frame floor
    drift. VBR is handled (each frame carries its own bitrate index);
    the summary bitrate is the first frame's."""
    pos = _skip_id3v2(data)
    if pos >= len(data):
        raise ValueError("mp3 payload has no audio frames")
    first_bitrate = None
    sample_rate = None
    n_frames = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("mp3 frame header truncated")
        h = struct.unpack_from(">I", data, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"mp3 lost frame sync at byte {pos}")
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0x3 or layer != 0x1:
            raise ValueError(
                "unsupported MPEG variant (probe handles MPEG-1 Layer III)"
            )
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        if br_idx == 0 or br_idx == 15:
            raise ValueError("mp3 free-format/reserved bitrate index")
        if sr_idx == 3:
            raise ValueError("mp3 reserved sample-rate index")
        bitrate = _BITRATES_V1_L3[br_idx] * 1000
        sr = _SAMPLE_RATES_V1[sr_idx]
        if sample_rate is None:
            sample_rate, first_bitrate = sr, _BITRATES_V1_L3[br_idx]
        elif sr != sample_rate:
            raise ValueError("mp3 sample rate changes mid-stream")
        frame_len = 144 * bitrate // sr + padding
        if pos + frame_len > len(data):
            raise ValueError("mp3 frame overruns payload (truncated)")
        pos += frame_len
        n_frames += 1
    # n_frames >= 1 here: the pre-loop guard raises when no frame
    # bytes follow the tag, and every loop pass raises or counts
    duration_ms = n_frames * _SAMPLES_PER_FRAME_V1_L3 * 1000 // sample_rate
    return Mp3Info(first_bitrate, sample_rate, n_frames, duration_ms)


def encode_mp3_cbr_silence(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100
) -> bytes:
    """Synthesize a structurally valid CBR MPEG-1 Layer III stream of
    ``n_frames`` frames with zeroed side-info/payload bytes — every
    header field is real (sync, version, layer, bitrate/sample-rate
    indices, padding=0), so probers (this one or ffprobe) read it, but
    it carries no audio. The fixture generator for the probe oracle."""
    br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    sr_idx = _SAMPLE_RATES_V1.index(sample_rate)
    h = (
        (0x7FF << 21)
        | (0x3 << 19)  # MPEG-1
        | (0x1 << 17)  # Layer III
        | (0x1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (0 << 9)  # padding
        | (0x3 << 6)  # channel mode: mono
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = struct.pack(">I", h) + b"\x00" * (frame_len - 4)
    return frame * n_frames
