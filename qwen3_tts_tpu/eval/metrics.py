"""Objective audio QA metrics harness.

Carries over the reference fork's quality-assurance capability (its
`quality_assurance_system*.py` wrap PESQ/STOI behind mocks) as real,
dependency-free implementations:

  - mel-cepstral distortion (MCD, dB) with DTW-free frame alignment
  - log-spectral distance (LSD, dB)
  - SNR / segmental SNR
  - speaker similarity (cosine over ECAPA embeddings)
  - codec round-trip report combining the above
"""

from __future__ import annotations

import numpy as np

from ..ops.mel import mel_filterbank, hann_window, stft_magnitude


def _mel_db(wav: np.ndarray, sr: int, n_fft: int = 1024, hop: int = 256,
            n_mels: int = 80) -> np.ndarray:
    import jax.numpy as jnp

    pad = (n_fft - hop) // 2
    x = np.pad(np.asarray(wav, np.float32), (pad, pad), mode="reflect")
    mag = np.asarray(stft_magnitude(jnp.asarray(x[None]), n_fft, hop,
                                    jnp.asarray(hann_window(n_fft))))[0]
    fb = mel_filterbank(sr, n_fft, n_mels)
    mel = fb @ mag
    return 20.0 * np.log10(np.clip(mel, 1e-5, None))


def _align(a: np.ndarray, b: np.ndarray):
    n = min(a.shape[-1], b.shape[-1])
    return a[..., :n], b[..., :n]


def mel_cepstral_distortion(ref: np.ndarray, syn: np.ndarray, sr: int = 24000,
                            n_mfcc: int = 13) -> float:
    """MCD (dB) over DCT-II cepstra of log-mels (c1..c{n_mfcc})."""
    mr = _mel_db(ref, sr)
    ms = _mel_db(syn, sr)
    mr, ms = _align(mr, ms)
    n_mels = mr.shape[0]
    k = np.arange(1, n_mfcc + 1)[:, None]
    basis = np.cos(np.pi * k * (np.arange(n_mels)[None, :] + 0.5) / n_mels)
    cr = basis @ mr
    cs = basis @ ms
    diff = cr - cs
    const = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return float(const / 20.0 * np.mean(np.sqrt(np.sum(diff ** 2, axis=0))))


def log_spectral_distance(ref: np.ndarray, syn: np.ndarray, sr: int = 24000) -> float:
    """LSD (dB) over power spectra."""
    import jax.numpy as jnp

    n_fft, hop = 1024, 256
    def spec_db(x):
        pad = (n_fft - hop) // 2
        xp = np.pad(np.asarray(x, np.float32), (pad, pad), mode="reflect")
        m = np.asarray(stft_magnitude(jnp.asarray(xp[None]), n_fft, hop,
                                      jnp.asarray(hann_window(n_fft))))[0]
        return 10.0 * np.log10(np.clip(m ** 2, 1e-10, None))

    a, b = _align(spec_db(ref), spec_db(syn))
    return float(np.mean(np.sqrt(np.mean((a - b) ** 2, axis=0))))


def snr(ref: np.ndarray, syn: np.ndarray) -> float:
    ref, syn = _align(np.asarray(ref, np.float64), np.asarray(syn, np.float64))
    noise = ref - syn
    p_sig = np.sum(ref ** 2)
    p_noise = max(np.sum(noise ** 2), 1e-12)
    return float(10.0 * np.log10(max(p_sig, 1e-12) / p_noise))


def segmental_snr(ref: np.ndarray, syn: np.ndarray, frame: int = 480) -> float:
    ref, syn = _align(np.asarray(ref, np.float64), np.asarray(syn, np.float64))
    n = (len(ref) // frame) * frame
    r = ref[:n].reshape(-1, frame)
    s = syn[:n].reshape(-1, frame)
    p_sig = np.sum(r ** 2, axis=1)
    p_noise = np.clip(np.sum((r - s) ** 2, axis=1), 1e-12, None)
    seg = 10.0 * np.log10(np.clip(p_sig, 1e-12, None) / p_noise)
    return float(np.mean(np.clip(seg, -10.0, 35.0)))


def speaker_similarity(model, ref: np.ndarray, syn: np.ndarray,
                       sr: int = 24000) -> float:
    """Cosine similarity of ECAPA speaker embeddings (needs a Base-type
    Qwen3TTSModel with a speaker encoder)."""
    e1 = model.extract_speaker_embedding(np.asarray(ref, np.float32), sr)
    e2 = model.extract_speaker_embedding(np.asarray(syn, np.float32), sr)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    return float(e1 @ e2 / max(np.linalg.norm(e1) * np.linalg.norm(e2), 1e-12))


def codec_roundtrip_report(tokenizer, wav: np.ndarray, sr: int) -> dict:
    """Encode->decode a waveform and score the reconstruction."""
    enc = tokenizer.encode([(wav, sr)])
    dec = tokenizer.decode(enc)
    out = dec.audio_values[0]
    return {
        "mcd_db": round(mel_cepstral_distortion(wav, out, sr), 3),
        "lsd_db": round(log_spectral_distance(wav, out, sr), 3),
        "snr_db": round(snr(wav, out), 3),
        "seg_snr_db": round(segmental_snr(wav, out), 3),
        "num_frames": int(enc.audio_codes[0].shape[0]),
    }
