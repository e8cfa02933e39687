"""Pure-numpy FLAC codec (decode + encoder twin for fixtures).

Implements the free lossless audio codec per the public format spec
(RFC 9639 / xiph.org FLAC format): fLaC magic, STREAMINFO metadata,
frames with CRC-8-guarded headers and CRC-16-guarded bodies, CONSTANT
/ VERBATIM / FIXED(0-4) / LPC subframes, Rice & Rice2 residual coding
with escape partitions, wasted bits, all four stereo decorrelation
modes (independent, left-side, right-side, mid-side), and the
STREAMINFO MD5 of the unencoded audio verified after decode. Being
LOSSLESS, any planted PCM gives a closed-form oracle — the same
payoff as PNG/GIF (functions/gif.py pattern), unlike the honestly
mp3-gated sample path (functions/mp3.py).

The encoder twin emits a deliberately small, always-valid subset
(16-bit mono/stereo-independent, fixed blocking, FIXED predictors
with single-partition Rice, CONSTANT where a block is flat) — enough
to exercise every decoder stage the fixtures need while the decoder
stays general per spec.

Error contract (the module-wide codecs rule): malformed, truncated,
or CRC/MD5-inconsistent input raises ValueError — never struct.error
or IndexError — so the quarantine seams (validate_media etc.) can
catch decode failures uniformly.

Scale note: decode is per-payload numpy inside Arrow batches behind
the shared decode_audio seam; a TB/s deployment swaps libFLAC behind
the same seam (SCALE.md "Multimodal").
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}

_SAMPLE_RATES = [
    None, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, "8bit_khz", "16bit_hz", "16bit_dhz", None,
]

_BITS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_POW2_DESC = (1 << np.arange(63, -1, -1)).astype(np.int64)


class _BitReader:
    """MSB-first bit reader over an unpacked bit array; every overrun
    is a ValueError (the codecs error contract). The one-positions are
    indexed ONCE up front so unary reads are a binary search instead
    of a rescan of the remaining stream — the rescan made Rice decode
    O(stream²) and a 75k-sample clip cost ~14 s."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._ones = np.flatnonzero(self._bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > self._bits.size:
            raise ValueError("FLAC payload truncated mid-field")
        v = int(self._bits[self.pos : self.pos + n] @ _POW2_DESC[64 - n :])
        self.pos += n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        i = int(np.searchsorted(self._ones, self.pos))
        if i >= self._ones.size:
            raise ValueError("FLAC payload truncated mid-unary")
        q = int(self._ones[i]) - self.pos
        self.pos += q + 1
        return q

    def align(self) -> None:
        rem = self.pos % 8
        if rem:
            if self.read(8 - rem) != 0:
                raise ValueError("FLAC frame has nonzero alignment padding")

    def byte_pos(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8


def _read_coded_number(br: _BitReader) -> int:
    """The UTF-8-style extended coded number (frame/sample index)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_ones = 0
    m = first
    while m & 0x80:
        n_ones += 1
        m = (m << 1) & 0xFF
    if n_ones == 1 or n_ones > 7:
        raise ValueError("FLAC coded number has invalid lead byte")
    val = first & (0x7F >> n_ones)
    for _ in range(n_ones - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC coded number has invalid continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _read_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    w = 0
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            out[w : w + n] = _read_rice_partition(br, n, param)
        w += n
    return out




def _read_rice_partition(br: _BitReader, n: int, param: int) -> np.ndarray:
    """Vectorized Rice decode of one partition: terminator positions
    come from the global one-position index (each sample's terminator
    is the first 1 at or after its remainder-skip point), then all n
    remainders are gathered with one fancy-index multiply."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    ones, bits, pos = br._ones, br._bits, br.pos
    q = np.empty(n, dtype=np.int64)
    rem_start = np.empty(n, dtype=np.int64)
    i = int(np.searchsorted(ones, pos))
    for k in range(n):  # O(n) total: i only advances
        while i < ones.size and ones[i] < pos:
            i += 1
        if i >= ones.size:
            raise ValueError("FLAC payload truncated mid-unary")
        term = int(ones[i])
        q[k] = term - pos
        rem_start[k] = term + 1
        pos = term + 1 + param
        i += 1
    if pos > bits.size:
        raise ValueError("FLAC payload truncated mid-field")
    br.pos = pos
    if param:
        idx = rem_start[:, None] + np.arange(param)
        rem = bits[idx].astype(np.int64) @ _POW2_DESC[64 - param :]
    else:
        rem = np.zeros(n, dtype=np.int64)
    z = (q << param) | rem
    return (z >> 1) ^ -(z & 1)  # un-zigzag


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC subframe header pad bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.array(
            [br.read_signed(eff) for _ in range(order)], dtype=np.int64
        )
        res = _read_residual(br, block_size, order)
        # FIXED-k prediction makes the residual the k-th difference of
        # the signal, so reconstruction is k inverse-difference passes
        # (one cumsum each) seeded from the warmup — fully vectorized
        out = res
        for j in range(order - 1, -1, -1):
            first = int(np.diff(warm, n=j)[0])
            out = np.concatenate(([first], first + np.cumsum(out)))
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("FLAC LPC precision code 15 is invalid")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = np.array([br.read_signed(prec) for _ in range(order)], dtype=np.int64)
        res = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = int(coefs @ out[i - order : i][::-1]) >> shift
            out[i] = pred + res[i - order]
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes → (sample_rate, int16 MONO samples). Stereo is
    downmixed floor((L+R)/2), the decode_wav convention, after
    undoing any left-side/right-side/mid-side decorrelation. CRC-8
    per frame header, CRC-16 per frame, and the STREAMINFO MD5 of the
    decoded audio are all verified — a hash-exact lossless contract."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos, streaminfo = 4, None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise ValueError("FLAC metadata block truncated")
        if btype == 0:
            if size != 34:
                raise ValueError("FLAC STREAMINFO must be 34 bytes")
            streaminfo = body
        elif btype == 127:
            raise ValueError("FLAC invalid metadata block type 127")
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = int.from_bytes(streaminfo, "big")
    # layout after the two 16-bit block sizes and two 24-bit frame sizes
    sample_rate = (si >> (34 * 8 - 80 - 20)) & 0xFFFFF
    n_channels = ((si >> (34 * 8 - 100 - 3)) & 0x7) + 1
    bps = ((si >> (34 * 8 - 103 - 5)) & 0x1F) + 1
    total = (si >> (34 * 8 - 108 - 36)) & ((1 << 36) - 1)
    md5 = streaminfo[18:34]
    if sample_rate == 0:
        raise ValueError("FLAC sample rate 0 is invalid")
    if n_channels > 2:
        raise ValueError(
            f"FLAC {n_channels}-channel audio is not supported — mono/stereo only"
        )

    br = _BitReader(data[pos:])
    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(n_channels)]
    got = 0
    # STREAMINFO total_samples == 0 legally means "unknown" (RFC 9639
    # §8.2, ADVICE r11): decode frames until the byte-aligned bitstream
    # is exhausted instead of treating it as an empty stream.
    while (got < total) if total else (br.pos < br._bits.size):
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync code not found")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        br.read(1)  # blocking strategy (coded number read either way)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 is reserved")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        sr = _SAMPLE_RATES[sr_code]
        if sr == "8bit_khz":
            sr = br.read(8) * 1000
        elif sr == "16bit_hz":
            sr = br.read(16)
        elif sr == "16bit_dhz":
            sr = br.read(16) * 10
        elif sr is None:
            if sr_code != 0:
                raise ValueError("FLAC sample rate code 15 is invalid")
            sr = sample_rate
        if sr != sample_rate:
            raise ValueError("FLAC frame sample rate disagrees with STREAMINFO")
        fbps = bps if ss_code == 0 else _BITS_CODES.get(ss_code)
        if fbps is None:
            raise ValueError(f"FLAC reserved sample size code {ss_code}")
        if fbps != bps:
            raise ValueError("FLAC frame sample size disagrees with STREAMINFO")
        hdr_end = (br.pos + 7) // 8  # header is byte-aligned here
        if br.pos % 8:
            raise ValueError("FLAC frame header not byte-aligned before CRC")
        hdr_bytes = data[pos + frame_start : pos + hdr_end]
        if _crc8(hdr_bytes) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            if ch_code + 1 != n_channels:
                raise ValueError("FLAC frame channel count disagrees with STREAMINFO")
            sub = [
                _read_subframe(br, block_size, fbps) for _ in range(n_channels)
            ]
        elif ch_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("FLAC stereo decorrelation in a mono stream")
            a = _read_subframe(br, block_size, fbps + (1 if ch_code == 9 else 0))
            b = _read_subframe(br, block_size, fbps + (0 if ch_code == 9 else 1))
            if ch_code == 8:  # left-side: a=L, b=S=L-R
                sub = [a, a - b]
            elif ch_code == 9:  # right-side: a=S=L-R, b=R
                sub = [a + b, b]
            else:  # mid-side
                mid, side = a, b
                m2 = (mid << 1) | (side & 1)
                sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"FLAC reserved channel assignment {ch_code}")
        br.align()
        body_end = br.byte_pos()
        if _crc16(data[pos + frame_start : pos + body_end]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        # last frame may be short-read; with unknown total every frame
        # is taken whole (the stream's own end delimits it)
        take = min(block_size, total - got) if total else block_size
        for c in range(n_channels):
            chans[c] = np.concatenate([chans[c], sub[c][:take]])
        got += take

    lim = 1 << (bps - 1)
    for c in chans:
        if c.size and (c.min() < -lim or c.max() >= lim):
            raise ValueError("FLAC decoded sample exceeds its bit depth")
    inter = np.empty(got * n_channels, dtype=np.int64)
    for c in range(n_channels):
        inter[c::n_channels] = chans[c]
    if bps == 16:
        raw = inter.astype("<i2").tobytes()
    else:
        width = (bps + 7) // 8
        raw = b"".join(
            int(v).to_bytes(width, "little", signed=True) for v in inter
        )
    # all-zero MD5 legally means "unavailable" (RFC 9639 §8.2) — the
    # companion of unknown total_samples; a real digest is verified
    if md5 != b"\x00" * 16 and hashlib.md5(raw).digest() != md5:
        raise ValueError("FLAC decoded audio fails the STREAMINFO MD5")
    if bps != 16:
        raise ValueError(f"FLAC {bps}-bit audio is not supported — 16-bit only")
    if n_channels == 2:
        mono = (chans[0] + chans[1]) // 2  # floor, the decode_wav convention
        return sample_rate, mono.astype(np.int16)
    return sample_rate, chans[0].astype(np.int16)


class _BitWriter:
    """Chunked MSB-first bit writer: scalar fields append tiny arrays,
    Rice streams append ONE vectorized block (the per-bit list-append
    form cost ~0.5 s per 75k-sample clip)."""

    def __init__(self):
        self._chunks: list[np.ndarray] = []
        self._nbits = 0

    def _push(self, arr: np.ndarray) -> None:
        self._chunks.append(arr)
        self._nbits += arr.size

    def write(self, value: int, n: int) -> None:
        self._push(
            np.fromiter(
                ((value >> i) & 1 for i in range(n - 1, -1, -1)),
                dtype=np.uint8,
                count=n,
            )
        )

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_rice_array(self, zig: np.ndarray, param: int) -> None:
        """All samples of one Rice partition in one vectorized block:
        q zeros, a 1 terminator, then param remainder bits each."""
        q = (zig >> param).astype(np.int64)
        total = q + 1 + param
        offs = np.concatenate(([0], np.cumsum(total[:-1])))
        arr = np.zeros(int(total.sum()), dtype=np.uint8)
        arr[offs + q] = 1
        for b in range(param):
            arr[offs + q + 1 + b] = ((zig >> (param - 1 - b)) & 1).astype(np.uint8)
        self._push(arr)

    def align(self) -> None:
        pad = -self._nbits % 8
        if pad:
            self._push(np.zeros(pad, dtype=np.uint8))

    def getvalue(self) -> bytes:
        assert self._nbits % 8 == 0
        return np.packbits(np.concatenate(self._chunks)).tobytes()


def _utf8_coded(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 6 * (n_bytes - 1) + (7 - n_bytes) and n_bytes < 7:
        n_bytes += 1
    lead_payload = n >> (6 * (n_bytes - 1))
    out.append(((0xFF << (8 - n_bytes)) & 0xFF) | lead_payload)
    for i in range(n_bytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def encode_flac(
    samples: np.ndarray, sample_rate: int, block_size: int = 1024, order: int = 2
) -> bytes:
    """Encoder twin for fixtures: 16-bit mono (1-D) or stereo
    (n×2 int16, encoded as independent channels), fixed blocking,
    FIXED-predictor subframes with single-partition Rice (CONSTANT
    where a block is flat), correct CRC-8/CRC-16 and STREAMINFO MD5.
    Always valid FLAC; deliberately not rate-optimal."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_flac expects 1-D or n×2 int16 samples")
    if samples.ndim == 2 and samples.shape[1] != 2:
        raise ValueError("encode_flac stereo input must be n×2")
    if not 1 <= block_size <= 65536 or not 0 <= order <= 4:
        raise ValueError("encode_flac: block_size in 1..65536, order in 0..4")
    chans = [samples] if samples.ndim == 1 else [samples[:, 0], samples[:, 1]]
    n_channels, total = len(chans), chans[0].size

    inter = np.empty(total * n_channels, dtype=np.int16)
    for c in range(n_channels):
        inter[c::n_channels] = chans[c]
    md5 = hashlib.md5(inter.astype("<i2").tobytes()).digest()

    si = 0
    si = (si << 16) | min(block_size, 65535)  # min block size
    si = (si << 16) | min(block_size, 65535)  # max block size
    si = (si << 24) | 0  # min frame size unknown
    si = (si << 24) | 0  # max frame size unknown
    si = (si << 20) | sample_rate
    si = (si << 3) | (n_channels - 1)
    si = (si << 5) | 15  # bps - 1
    si = (si << 36) | total
    streaminfo = si.to_bytes(18, "big") + md5
    out = [b"fLaC", bytes([0x80]), len(streaminfo).to_bytes(3, "big"), streaminfo]

    frame_idx = 0
    for start in range(0, total, block_size):
        bs = min(block_size, total - start)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit value-1 follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(n_channels - 1, 4)
        bw.write(4, 3)  # sample size: 16 bits
        bw.write(0, 1)  # reserved
        for b in _utf8_coded(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.getvalue()  # header is byte-aligned here by construction
        bw.write(_crc8(hdr), 8)

        for ch in chans:
            blk = ch[start : start + bs].astype(np.int64)
            bw.write(0, 1)  # pad
            if np.all(blk == blk[0]):
                bw.write(0, 6)  # CONSTANT
                bw.write(0, 1)  # no wasted bits
                bw.write_signed(int(blk[0]), 16)
                continue
            k = min(order, bs - 1)
            bw.write(8 + k, 6)  # FIXED order k
            bw.write(0, 1)  # no wasted bits
            for v in blk[:k]:
                bw.write_signed(int(v), 16)
            res = blk.copy()
            for _ in range(k):  # k-th difference = FIXED-k residual
                res = np.diff(res)
            zig = np.where(res >= 0, res << 1, (-res << 1) - 1)
            bw.write(0, 2)  # Rice method 0
            bw.write(0, 4)  # partition order 0
            zmax = int(zig.max()) if zig.size else 0
            param = 0
            while param < 14 and (zmax >> param) > 24:
                param += 1
            bw.write(param, 4)
            bw.write_rice_array(zig.astype(np.int64), param)
        bw.align()
        body = bw.getvalue()
        out.append(body)
        out.append(_crc16(body).to_bytes(2, "big"))
        frame_idx += 1
    return b"".join(out)
