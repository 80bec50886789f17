"""PESQ (ITU-T P.862) quality score — certified package when available,
first-party perceptual approximation otherwise.

BASELINE.md's tokenizer-reconstruction guardrail row publishes PESQ-WB 3.21 /
PESQ-NB 3.68 (reference README.md:1326-1335). The certified ITU reference
implementation lives in the `pesq` PyPI package (C code); when it is
importable, `pesq_score` delegates to it and returns certified numbers.

In this zero-extra-deps environment `pesq_score` falls back to
`pesq_approx`, a P.862-*inspired* perceptual distance:

  - resample to 16 kHz (wb) / 8 kHz (nb), global level equalisation to a
    79 dB-SPL-like active level (P.862 calibration point)
  - 32 ms Hann frames, 50% overlap, power spectra
  - Bark-scale band integration (0.5-Bark bands via the Traunmüller
    formula instead of the ITU band tables)
  - per-band linear-filtering compensation and per-frame gain
    compensation (as in P.862 §10.2.2, clipped ratio form)
  - hearing-threshold-floored band log-powers (Terhardt absolute-threshold
    approximation in place of the ITU threshold tables): sub-threshold
    energy is inaudible and contributes nothing
  - symmetric disturbance = rms dB band difference per frame; asymmetric
    disturbance = rms of the POSITIVE (additive-noise) band differences,
    weighted extra as in P.862's asymmetry factor
  - L6-over-frames / L2-over-320ms-intervals aggregation (P.862's
    two-stage Lp), then a calibrated logistic map onto [1.0, 4.5] MOS

It is monotonic in distortion level per degradation family and returns 4.5
for identical signals, but is NOT the certified algorithm (in particular no
time-alignment stage — fine for codec round-trips, which are
sample-aligned). `result["certified"]` says which path ran.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _try_reference_pesq(ref, deg, sr, mode):
    try:
        from pesq import pesq as _pesq  # certified ITU implementation
    except ImportError:
        return None
    from ..utils.audio_io import resample

    target = 16000 if mode == "wb" else 8000
    r = np.asarray(resample(np.asarray(ref, np.float32), sr, target))
    d = np.asarray(resample(np.asarray(deg, np.float32), sr, target))
    return float(_pesq(target, r, d, mode))


def _bark(f: np.ndarray) -> np.ndarray:
    """Traunmüller critical-band rate approximation."""
    return 26.81 * f / (1960.0 + f) - 0.53


def _abs_threshold_db(f: np.ndarray) -> np.ndarray:
    """Terhardt's absolute hearing threshold (dB SPL) approximation."""
    khz = np.clip(f, 20.0, None) / 1000.0
    return (3.64 * khz ** -0.8
            - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
            + 1e-3 * khz ** 4)


def pesq_approx(ref: np.ndarray, deg: np.ndarray, sr: int,
                mode: str = "wb") -> float:
    from ..utils.audio_io import resample

    if mode not in ("wb", "nb"):
        raise ValueError(f"mode must be 'wb' or 'nb', got {mode!r}")
    fs = 16000 if mode == "wb" else 8000
    x = np.asarray(ref, np.float64)
    y = np.asarray(deg, np.float64)
    if sr != fs:
        x = np.asarray(resample(x.astype(np.float32), sr, fs), np.float64)
        y = np.asarray(resample(y.astype(np.float32), sr, fs), np.float64)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]

    # level equalisation: both signals to a nominal 79 dB SPL active level
    # (P.862 calibrates to 79 dB SPL at the ear reference point)
    target_rms = 10.0 ** (79.0 / 20.0)
    x *= target_rms / (np.sqrt(np.mean(x ** 2)) + _EPS)
    y *= target_rms / (np.sqrt(np.mean(y ** 2)) + _EPS)

    frame = int(0.032 * fs)
    hop = frame // 2
    nfft = frame
    win = np.hanning(frame)
    n_frames = (n - frame) // hop + 1
    if n_frames < 4:
        raise ValueError("signal too short for PESQ approximation")
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    X = np.abs(np.fft.rfft(x[idx] * win, nfft, axis=1)) ** 2  # (T, F)
    Y = np.abs(np.fft.rfft(y[idx] * win, nfft, axis=1)) ** 2

    # Bark integration: 0.5-Bark bands over [50 Hz, Nyquist)
    f = np.fft.rfftfreq(nfft, 1.0 / fs)
    zb = _bark(f)
    z_lo, z_hi = _bark(np.array([50.0]))[0], zb[-1]
    n_bands = int(np.floor((z_hi - z_lo) / 0.5))
    edges = z_lo + 0.5 * np.arange(n_bands + 1)
    band_of = np.digitize(zb, edges) - 1
    valid = (band_of >= 0) & (band_of < n_bands)
    B = np.zeros((n_bands, len(f)))
    B[band_of[valid], np.nonzero(valid)[0]] = 1.0
    cnt = np.clip(B.sum(axis=1), 1.0, None)
    Px = (X @ B.T) / cnt           # (T, bands) mean power per band
    Py = (Y @ B.T) / cnt
    centers_hz = (B @ f) / cnt

    # speech-active frames of the reference drive the score
    fe = 10.0 * np.log10(Px.sum(axis=1) + _EPS)
    active = fe > (fe.max() - 45.0)
    if not np.any(active):
        active = np.ones(len(fe), bool)

    # partial linear-filtering compensation (per band, P.862 §10.2.1 form,
    # tighter +-10 dB clip: the ITU +-20 dB bound is balanced against its
    # sone-domain deadzone, which this approximation does not reproduce —
    # at +-20 dB broadband additive noise in reference-silent bands gets
    # absorbed as fake "filter gain" and the score stops being monotonic)
    mean_x = Px[active].mean(axis=0)
    mean_y = Py[active].mean(axis=0)
    band_factor = np.clip((mean_y + 1000.0) / (mean_x + 1000.0), 0.1, 10.0)
    Px = Px * band_factor[None, :]

    # short-term gain compensation (per frame, degraded side)
    gain = np.clip((Px.sum(axis=1) + 5e3) / (Py.sum(axis=1) + 5e3), 3e-4, 5.0)
    Py = Py * gain[:, None]

    # hearing-threshold-floored band log-powers: adding the absolute
    # threshold P0 inside the log makes sub-threshold energy contribute ~0
    P0 = 10.0 ** (_abs_threshold_db(centers_hz) / 10.0)
    Lx = 10.0 * np.log10(Px + P0[None, :])
    Ly = 10.0 * np.log10(Py + P0[None, :])

    diff = Ly - Lx
    d_sym_f = np.sqrt(np.mean(diff ** 2, axis=1))
    # asymmetry: additive (coding-noise) disturbance weighs more than
    # omission, mirroring P.862's asymmetry factor
    d_asym_f = np.sqrt(np.mean(np.clip(diff, 0.0, None) ** 2, axis=1))

    def two_stage(d):
        d = d[active]
        spf = max(int(0.32 * fs / hop), 1)  # frames per ~320 ms interval
        pads = (-len(d)) % spf
        if pads:
            d = np.concatenate([d, np.zeros(pads)])
        per_int = (np.mean(d.reshape(-1, spf) ** 6, axis=1)) ** (1 / 6)
        return float(np.sqrt(np.mean(per_int ** 2)))

    d_total = two_stage(d_sym_f) + 0.3 * two_stage(d_asym_f)
    if d_total <= 1e-9:
        return 4.5
    # logistic map calibrated on additive-noise / quantization sweeps so
    # ~45 dB SNR ~ 4.0 MOS, ~25 dB ~ 3.2, ~0 dB ~ 1.6, 4-bit quant ~ 1.4
    mos = 1.0 + 3.5 / (1.0 + np.exp((d_total - 40.0) / 8.5))
    return float(np.clip(mos, 1.0, 4.5))


def pesq_score(ref: np.ndarray, deg: np.ndarray, sr: int,
               mode: str = "wb") -> dict:
    """PESQ MOS for (ref, deg) at sample rate `sr`.

    Returns {"mos": float, "mode": mode, "certified": bool} — certified=True
    only when the ITU reference implementation (`pesq` package) ran.
    """
    certified = _try_reference_pesq(ref, deg, sr, mode)
    if certified is not None:
        return {"mos": certified, "mode": mode, "certified": True}
    return {"mos": pesq_approx(ref, deg, sr, mode), "mode": mode,
            "certified": False}
