"""25Hz legacy codec tokenizer: composite encode/decode API.

Mirrors reference Qwen3TTSTokenizerV1Model (modeling_..._v1.py:1360-1525):
encode -> (25Hz codes, CAM++ x-vector, BigVGAN-style ref mel);
decode(codes, xvectors, ref_mels) -> DiT flow matching -> BigVGAN -> wave.

The CAM++ x-vector runs through onnxruntime when available (as in the
reference); otherwise a user-provided extractor callable can be injected —
the rest of the pipeline is fully TPU-native.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import CodecV1Config
from ...ops.mel import hann_window, mel_filterbank
from .bigvgan import bigvgan_forward
from .dit import dit_sample
from .whisper_vq import get_T_after_cnn, get_mel_audio, whisper_vq_encode


def sox_norm_minus6db(audio: np.ndarray) -> np.ndarray:
    """sox `norm -6`: scale peak amplitude to -6 dBFS
    (reference speech_vq.py:127-128, 157-159)."""
    peak = np.max(np.abs(audio))
    if peak < 1e-12:
        return audio.astype(np.float32)
    return (audio * (10 ** (-6 / 20) / peak)).astype(np.float32)


def kaldi_fbank_80(audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
    """Kaldi-compatible fbank (torchaudio.compliance.kaldi.fbank defaults,
    dither=0): 25ms povey window / 10ms shift, snip edges, preemphasis 0.97,
    HTK-free kaldi mel banks, log energies. Returns (T, 80) float32."""
    frame_len = int(sample_rate * 0.025)
    frame_shift = int(sample_rate * 0.010)
    n_fft = 512  # round up to pow2
    num_bins = 80

    x = np.asarray(audio, np.float32) * 32768.0  # kaldi int16 scaling
    n_frames = 1 + (len(x) - frame_len) // frame_shift
    if n_frames < 1:
        return np.zeros((0, num_bins), np.float32)
    idx = np.arange(n_frames)[:, None] * frame_shift + np.arange(frame_len)[None, :]
    frames = x[idx].copy()
    # remove DC offset
    frames -= frames.mean(axis=1, keepdims=True)
    # preemphasis (kaldi: x[i] - 0.97 * x[i-1], first sample vs itself)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * pre
    # povey window: hann^0.85
    n = np.arange(frame_len)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    frames = frames * window
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    # kaldi mel banks: bins spaced on mel between low 20Hz and high nyquist-400? kaldi defaults low=20, high=0(nyquist)
    low_freq, high_freq = 20.0, sample_rate / 2
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (np.exp(m / 1127.0) - 1.0)
    mel_pts = np.linspace(mel(low_freq), mel(high_freq), num_bins + 2)
    bin_freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fb = np.zeros((num_bins, len(bin_freqs)), np.float32)
    for i in range(num_bins):
        left, center, right = imel(mel_pts[i]), imel(mel_pts[i + 1]), imel(mel_pts[i + 2])
        up = (bin_freqs - left) / (center - left)
        down = (right - bin_freqs) / (right - center)
        fb[i] = np.maximum(0, np.minimum(up, down))
    feat = np.log(np.maximum(spec @ fb.T, np.finfo(np.float32).eps))
    return feat.astype(np.float32)


def bigvgan_ref_mel(audio: np.ndarray) -> np.ndarray:
    """BigVGAN-style ref mel (reference MelSpectrogramFeatures, 16kHz,
    n_fft 1024 / hop 160 / win 640, fmax 8000). Returns (T, 80)."""
    n_fft, hop, win = 1024, 160, 640
    x = np.asarray(audio, np.float32)
    pad = (n_fft - hop) // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    # torch.stft zero-pads the window to n_fft, centered
    w = np.zeros(n_fft, np.float32)
    off = (n_fft - win) // 2
    w[off:off + win] = hann_window(win)
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    spec = np.fft.rfft(x[idx] * w, axis=1)
    mag = np.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).T
    fb = mel_filterbank(16000, n_fft, 80, 0.0, 8000.0)
    mel = fb @ mag
    return np.log(np.clip(mel, 1e-5, None)).T.astype(np.float32)  # (T, 80)


@dataclass
class EncoderV1Output:
    audio_codes: List[np.ndarray]
    xvectors: List[np.ndarray]
    ref_mels: List[np.ndarray]


@dataclass
class DecoderV1Output:
    audio_values: List[np.ndarray]


class Qwen3TTSTokenizerV1:
    """25Hz codec tokenizer."""

    def __init__(self, config: CodecV1Config, encoder_params=None,
                 dit_params=None, bigvgan_params=None,
                 xvector_extractor: Optional[Callable] = None):
        self.config = config
        self.encoder_params = encoder_params
        self.dit_params = dit_params
        self.bigvgan_params = bigvgan_params
        self.xvector_extractor = xvector_extractor
        self._enc_jit = {}
        self._dec_jit = {}

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32) -> "Qwen3TTSTokenizerV1":
        import os

        from ...utils.weights import load_safetensors_dir
        from .convert import convert_bigvgan, convert_dit
        from .whisper_vq import convert_whisper_vq

        cfg = CodecV1Config.from_json(os.path.join(model_dir, "config.json"))
        sd = load_safetensors_dir(model_dir)
        enc = convert_whisper_vq(sd, cfg.encoder, prefix="encoder.tokenizer.")
        dit = convert_dit(sd, cfg.dit, prefix="decoder.dit.")
        vgan = convert_bigvgan(sd, cfg.bigvgan, prefix="decoder.bigvgan.")
        to_dev = lambda p: jax.tree.map(
            lambda x: jnp.asarray(x, dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x), p)
        xv = None
        onnx_path = os.path.join(model_dir, "campplus.onnx")
        if os.path.isfile(onnx_path):
            try:
                xv = OnnxXVectorExtractor(onnx_path)
            except ImportError:
                xv = None
        return cls(cfg, to_dev(enc), to_dev(dit), to_dev(vgan), xv)

    # -- encode --------------------------------------------------------------

    def encode(self, wavs: List[np.ndarray]) -> EncoderV1Output:
        """wavs: list of float32 arrays at input_sample_rate."""
        codes_list, xvecs, ref_mels = [], [], []
        for wav in wavs:
            mel = get_mel_audio(np.asarray(wav, np.float32), padding=True,
                                audio_vq_ds_rate=self.config.encoder.audio_vq_ds_rate,
                                n_mels=self.config.encoder.n_mels)
            t_cnn = get_T_after_cnn(mel.shape[1])
            key = mel.shape
            if key not in self._enc_jit:
                self._enc_jit[key] = jax.jit(
                    lambda p, m: whisper_vq_encode(p, self.config.encoder, m))
            codes = np.asarray(self._enc_jit[key](self.encoder_params, jnp.asarray(mel)))
            codes_list.append(codes[: t_cnn // self.config.encoder.audio_vq_ds_rate])

            if self.xvector_extractor is not None:
                xvec, ref_mel = self.xvector_extractor(np.asarray(wav, np.float32))
            else:
                norm = sox_norm_minus6db(np.asarray(wav, np.float32))
                ref_mel = bigvgan_ref_mel(norm)
                xvec = np.zeros((self.config.dit.enc_emb_dim,), np.float32)
            xvecs.append(np.asarray(xvec, np.float32))
            ref_mels.append(np.asarray(ref_mel, np.float32))
        return EncoderV1Output(codes_list, xvecs, ref_mels)

    # -- decode --------------------------------------------------------------

    def decode(self, audio_codes, xvectors, ref_mels, num_steps: int = 10,
               guidance_scale: float = 0.5, sway_coefficient: float = -1.0,
               seed: int = 0) -> DecoderV1Output:
        """codes (B, T) int; xvectors (B, 192); ref_mels (B, T_ref, 80)."""
        codes = jnp.asarray(np.stack([np.asarray(c) for c in audio_codes]))
        xv = jnp.asarray(np.stack([np.asarray(x) for x in xvectors]), jnp.float32)
        rm = jnp.asarray(np.stack([np.asarray(m) for m in ref_mels]), jnp.float32)

        key = (codes.shape, rm.shape, num_steps, guidance_scale, sway_coefficient)
        if key not in self._dec_jit:
            def fn(dp, bp, c, x, m, k):
                mel = dit_sample(dp, self.config.dit, c, m, x, k,
                                 num_steps=num_steps, guidance_scale=guidance_scale,
                                 sway_coefficient=sway_coefficient)
                return bigvgan_forward(bp, self.config.bigvgan, mel)
            self._dec_jit[key] = jax.jit(fn)
        wav = np.asarray(self._dec_jit[key](self.dit_params, self.bigvgan_params,
                                            codes, xv, rm, jax.random.PRNGKey(seed)))
        up = self.config.decode_upsample_rate
        out = []
        for i, c in enumerate(audio_codes):
            n_valid = int((np.asarray(c) > 0).sum()) * up
            out.append(wav[i, :n_valid].astype(np.float32))
        return DecoderV1Output(out)

    def get_model_type(self):
        return self.config.model_type

    def get_input_sample_rate(self):
        return self.config.input_sample_rate

    def get_output_sample_rate(self):
        return self.config.output_sample_rate

    def get_encode_downsample_rate(self):
        return self.config.encode_downsample_rate

    def get_decode_upsample_rate(self):
        return self.config.decode_upsample_rate


class OnnxXVectorExtractor:
    """CAM++ x-vector via onnxruntime (reference speech_vq.py:118-159)."""

    def __init__(self, onnx_path: str):
        import onnxruntime  # gated: absent in TPU-only images

        opt = onnxruntime.SessionOptions()
        opt.intra_op_num_threads = 1
        self.session = onnxruntime.InferenceSession(
            onnx_path, sess_options=opt, providers=["CPUExecutionProvider"])

    def __call__(self, audio: np.ndarray):
        norm = sox_norm_minus6db(audio)
        feat = kaldi_fbank_80(norm)
        feat = feat - feat.mean(axis=0, keepdims=True)
        emb = self.session.run(
            None, {self.session.get_inputs()[0].name: feat[None]})[0].flatten()
        emb = emb / max(np.linalg.norm(emb), 1e-12)
        ref_mel = bigvgan_ref_mel(norm)
        return emb.astype(np.float32), ref_mel
