"""Short-Time Objective Intelligibility (STOI) — dependency-free.

Faithful implementation of Taal, Hendriks, Heusdens & Jensen, "An Algorithm
for Intelligibility Prediction of Time-Frequency Weighted Noisy Speech"
(IEEE TASL 2011), matching the published MATLAB/pystoi reference pipeline:
10 kHz resample, silent-frame removal (40 dB dynamic range), 256/128 STFT
to 512 bins, 15 one-third-octave bands from 150 Hz, 30-frame (384 ms)
segments with -15 dB SDR clipping, averaged band/segment correlation.

This is a BASELINE.md guardrail metric (reference README.md:1326-1335
publishes Tokenizer-12Hz STOI 0.96); the reference fork only wraps the
`pystoi` package behind mocks (quality_assurance_system.py), here it is a
first-party implementation so the quality gate runs with zero extra deps.
"""

from __future__ import annotations

import numpy as np

FS = 10000          # analysis sample rate (Hz)
N_FRAME = 256       # window length (25.6 ms)
HOP = 128
NFFT = 512
NUM_BANDS = 15
MIN_FREQ = 150.0    # center frequency of the lowest 1/3-octave band
SEG_LEN = 30        # frames per intermediate-intelligibility segment (384 ms)
BETA = -15.0        # lower SDR bound (dB)
DYN_RANGE = 40.0    # silent-frame removal range (dB)
_EPS = np.finfo(np.float64).eps


def _thirdoct(fs: int, nfft: int, num_bands: int, min_freq: float):
    """1/3-octave band matrix over rfft bins (paper eq. (1) band grouping)."""
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands, dtype=np.float64)
    cf = (2.0 ** (1.0 / 3.0)) ** k * min_freq
    lo = min_freq * 2.0 ** ((2 * k - 1) / 6.0)
    hi = min_freq * 2.0 ** ((2 * k + 1) / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        fl = int(np.argmin(np.square(f - lo[i])))
        fh = int(np.argmin(np.square(f - hi[i])))
        obm[i, fl:fh] = 1.0
    return obm, cf


def _frames(x: np.ndarray, win: np.ndarray) -> np.ndarray:
    n = (len(x) - N_FRAME) // HOP + 1
    if n <= 0:
        return np.zeros((0, N_FRAME))
    idx = np.arange(N_FRAME)[None, :] + HOP * np.arange(n)[:, None]
    return x[idx] * win[None, :]


def _remove_silent_frames(x: np.ndarray, y: np.ndarray):
    """Drop frames >40 dB below the loudest REF frame; overlap-add back."""
    win = np.hanning(N_FRAME + 2)[1:-1]
    xf = _frames(x, win)
    yf = _frames(y, win)
    energies = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + _EPS)
    keep = energies > (np.max(energies) - DYN_RANGE)
    xf, yf = xf[keep], yf[keep]
    n_out = (len(xf) - 1) * HOP + N_FRAME if len(xf) else 0
    xs = np.zeros(n_out)
    ys = np.zeros(n_out)
    for i in range(len(xf)):
        xs[i * HOP:i * HOP + N_FRAME] += xf[i]
        ys[i * HOP:i * HOP + N_FRAME] += yf[i]
    return xs, ys


def _band_spectrogram(x: np.ndarray, obm: np.ndarray) -> np.ndarray:
    win = np.hanning(N_FRAME + 2)[1:-1]
    fr = _frames(x, win)
    spec = np.abs(np.fft.rfft(fr, NFFT, axis=1)) ** 2
    return np.sqrt(obm @ spec.T)  # (bands, frames)


def stoi(ref: np.ndarray, deg: np.ndarray, sr: int) -> float:
    """STOI in [~0, 1]; higher = more intelligible. Inputs are resampled to
    10 kHz and truncated to the common length."""
    from ..utils.audio_io import resample

    ref = np.asarray(ref, np.float64)
    deg = np.asarray(deg, np.float64)
    if sr != FS:
        ref = np.asarray(resample(ref.astype(np.float32), sr, FS), np.float64)
        deg = np.asarray(resample(deg.astype(np.float32), sr, FS), np.float64)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    ref, deg = _remove_silent_frames(ref, deg)
    if len(ref) < N_FRAME + HOP * (SEG_LEN - 1):
        raise ValueError("signal too short for STOI after silence removal "
                         f"({len(ref)} samples; needs >= "
                         f"{N_FRAME + HOP * (SEG_LEN - 1)} at 10 kHz)")

    obm, _ = _thirdoct(FS, NFFT, NUM_BANDS, MIN_FREQ)
    X = _band_spectrogram(ref, obm)
    Y = _band_spectrogram(deg, obm)

    clip = 10.0 ** (-BETA / 20.0)
    corrs = []
    for m in range(SEG_LEN, X.shape[1] + 1):
        xs = X[:, m - SEG_LEN:m]
        ys = Y[:, m - SEG_LEN:m]
        alpha = np.linalg.norm(xs, axis=1, keepdims=True) / (
            np.linalg.norm(ys, axis=1, keepdims=True) + _EPS)
        yp = np.minimum(ys * alpha, xs * (1.0 + clip))
        xc = xs - xs.mean(axis=1, keepdims=True)
        yc = yp - yp.mean(axis=1, keepdims=True)
        num = np.sum(xc * yc, axis=1)
        den = np.linalg.norm(xc, axis=1) * np.linalg.norm(yc, axis=1) + _EPS
        corrs.append(num / den)
    return float(np.mean(corrs))
