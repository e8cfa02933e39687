"""Pure-numpy spectral analysis for the audio modality.

Single-bin DFT projections (the vectorized equivalent of the Goertzel
algorithm — ITU-T Q.24 describes DTMF receivers built exactly this
way) plus a DTMF digit detector over decoded PCM. This is the
spectral half of the audio pipeline: operators/multimodal.py decodes
the telephony container (G.711 mu-law WAV, functions/codecs.py) and
hands int16 samples here; everything below is per-clip numpy with no
Spark dependency, so the same code runs inside Arrow ``mapInPandas``
batches on executors.

Reference provenance: degdb has no audio surface; this implements the
tone-analysis leg of the brief's multimodal requirement (decode /
feature-extract as Pandas-UDF plumbing) with a REAL detector: energy
gating segments the clip, a single-bin DFT bank measures the seven numeric-keypad
DTMF frequencies, and the (row, column) argmax pair maps back to the
keypad digit. Frequencies are the published ITU-T Q.23 assignments.
"""

from __future__ import annotations

import numpy as np

#: ITU-T Q.23 DTMF frequency assignments (Hz). Digits 0-9 use all four
#: row tones and the first three column tones (1633 Hz is the A-D
#: military column, unused by numeric keypads).
DTMF_ROWS = (697.0, 770.0, 852.0, 941.0)
DTMF_COLS = (1209.0, 1336.0, 1477.0)

#: keypad layout: digit -> (row index, column index)
_KEYPAD = {
    1: (0, 0), 2: (0, 1), 3: (0, 2),
    4: (1, 0), 5: (1, 1), 6: (1, 2),
    7: (2, 0), 8: (2, 1), 9: (2, 2),
    0: (3, 1),
}
#: inverse layout: (row, col) -> digit, for the detector
_DIGIT_AT = {rc: d for d, rc in _KEYPAD.items()}


def tone_powers(samples: np.ndarray, freqs, sample_rate: int) -> np.ndarray:
    """Single-bin DFT power at each frequency: |sum x[t]·e^{-j2πft/fs}|²
    normalized by the frame length. One matrix multiply over the whole
    frame — the vectorized form of running one Goertzel filter per
    frequency (identical output, no per-sample Python loop)."""
    x = samples.astype(np.float64)
    if x.size == 0:
        return np.zeros(len(freqs))
    t = np.arange(x.size)
    w = 2.0 * np.pi * np.asarray(freqs, dtype=np.float64)[:, None] / sample_rate
    re = (np.cos(w * t[None, :]) @ x)
    im = (np.sin(w * t[None, :]) @ x)
    return (re * re + im * im) / x.size


def synth_dtmf(
    digits, sample_rate: int = 8000, tone_ms: int = 80, gap_ms: int = 40,
    amplitude: int = 6000,
) -> np.ndarray:
    """int16 DTMF signal for a digit sequence: per digit, ``tone_ms``
    of the Q.23 (row + column) sine pair followed by ``gap_ms`` of
    exact silence. Peak is 2·amplitude, kept well under int16."""
    n_tone = sample_rate * tone_ms // 1000
    n_gap = sample_rate * gap_ms // 1000
    t = np.arange(n_tone) / sample_rate
    parts = []
    for d in digits:
        r, c = _KEYPAD[int(d)]
        wave = amplitude * (
            np.sin(2 * np.pi * DTMF_ROWS[r] * t)
            + np.sin(2 * np.pi * DTMF_COLS[c] * t)
        )
        parts.append(np.round(wave).astype(np.int16))
        parts.append(np.zeros(n_gap, dtype=np.int16))
    if not parts:
        return np.zeros(0, dtype=np.int16)
    return np.concatenate(parts)


def _active_segments(samples: np.ndarray, block: int, threshold: int):
    """Contiguous runs of blocks whose peak magnitude exceeds the
    threshold → (start_sample, end_sample) spans. Energy gating, the
    standard first stage of a tone receiver."""
    n_blocks = samples.size // block
    if n_blocks == 0:
        return []
    peaks = (
        np.abs(samples[: n_blocks * block].astype(np.int32))
        .reshape(n_blocks, block)
        .max(axis=1)
    )
    active = peaks > threshold
    spans = []
    start = None
    for b, a in enumerate(active):
        if a and start is None:
            start = b
        elif not a and start is not None:
            spans.append((start * block, b * block))
            start = None
    if start is not None:
        spans.append((start * block, n_blocks * block))
    return spans


def detect_dtmf(
    samples: np.ndarray, sample_rate: int, block_ms: int = 10,
    threshold: int = 100, min_twist_ratio: float = 4.0,
) -> str:
    """Decode a DTMF digit string from PCM: energy-gate into tone
    segments, measure the seven numeric-keypad Q.23 frequencies per segment with the
    single-bin DFT bank, and take the (row, col) power argmax. A
    segment whose winning row/col tones do not dominate the other
    tones in their group by ``min_twist_ratio`` is rejected (returned
    as '?') rather than guessed — receivers must not hallucinate
    digits from noise (ITU-T Q.24 talk-off requirement)."""
    block = max(1, sample_rate * block_ms // 1000)
    out = []
    for lo, hi in _active_segments(samples, block, threshold):
        seg = samples[lo:hi]
        rp = tone_powers(seg, DTMF_ROWS, sample_rate)
        cp = tone_powers(seg, DTMF_COLS, sample_rate)
        r = int(np.argmax(rp))
        c = int(np.argmax(cp))
        r_others = np.delete(rp, r)
        c_others = np.delete(cp, c)
        ok = (
            rp[r] > min_twist_ratio * max(float(r_others.max()), 1e-9)
            and cp[c] > min_twist_ratio * max(float(c_others.max()), 1e-9)
        )
        out.append(str(_DIGIT_AT.get((r, c), "?")) if ok else "?")
    return "".join(out)
