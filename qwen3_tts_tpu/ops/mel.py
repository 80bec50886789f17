"""Mel-spectrogram front-end in numpy/jnp — librosa-free.

Replaces the reference's librosa/torch.stft dependency
(reference modeling_qwen3_tts.py:396-464: slaney-norm mel filterbank,
Hann window, center=False STFT with (n_fft-hop)//2 reflect pre-pad,
sqrt(re^2+im^2+1e-9) magnitude, log(clamp(x, 1e-5)) compression).
The filterbank math reproduces librosa.filters.mel(htk=False, norm="slaney")
— validated against the reference's shipped mel_filters.npz snapshot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-10)
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(safe_f / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank
    (librosa.filters.mel equivalent). Returns (n_mels, 1 + n_fft//2) f32."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min = _hz_to_mel_slaney(np.array([fmin]))[0]
    mel_max = _hz_to_mel_slaney(np.array([fmax]))[0]
    mel_f = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def stft_magnitude(y: jax.Array, n_fft: int, hop: int, window: jax.Array) -> jax.Array:
    """|STFT| with center=False framing. y: (B, T) already padded.
    Returns (B, n_freq, n_frames) magnitude sqrt(re^2 + im^2 + 1e-9)."""
    b, t = y.shape
    n_frames = 1 + (t - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = y[:, idx] * window  # (B, F, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    mag = jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + 1e-9)
    return jnp.transpose(mag, (0, 2, 1))


def mel_spectrogram(y: jax.Array, n_fft: int = 1024, num_mels: int = 128,
                    sampling_rate: int = 24000, hop_size: int = 256,
                    win_size: int = 1024, fmin: float = 0.0,
                    fmax: float | None = 12000.0) -> jax.Array:
    """Log-mel exactly as the reference speaker-encoder front-end.
    y: (B, T) in [-1, 1]. Returns (B, num_mels, n_frames)."""
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    window = jnp.asarray(hann_window(win_size))
    mag = stft_magnitude(y, n_fft, hop_size, window)  # (B, F, T)
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(jnp.clip(mel, 1e-5, None))
