"""25Hz encoder: Whisper-VQ (speech -> 25Hz discrete codes).

Reference WhisperEncoderVQ (reference vq/whisper_encoder.py +
vq/speech_vq.py:160-357): whisper log-mel (N_FFT 400 / hop 160, 16k-designed
filterbank), per-200-frame-chunk conv1/conv2 (stride 2) + sinusoidal PE,
6 pre-VQ attention blocks over 100-frame window segments (varlen packing in
the reference == segment-masked attention here), downsample conv (k2 s2),
then GRVQ nearest-codebook encode (1 group / 1 quantizer, 32768 x 1280).
Only the encode-to-indices path is implemented — that is all the TTS
pipeline consumes (reference mel2code :1318-1335).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config import WhisperVQEncoderConfig
from ...nn.layers import layer_norm, linear
from ...ops.mel import mel_filterbank, hann_window

N_FFT = 400
HOP_LENGTH = 160


def whisper_log_mel(audio: np.ndarray, n_mels: int = 128, padding: int = 0) -> np.ndarray:
    """Reference log_mel_spectrogram (whisper_encoder.py:62-107): center=True
    STFT, |.|^2 magnitudes (last frame dropped), log10 with utterance-max
    normalization. Host-side numpy. Returns (n_mels, T)."""
    x = np.asarray(audio, np.float32)
    if padding > 0:
        x = np.pad(x, (0, padding))
    # torch.stft center=True: reflect-pad n_fft//2
    xp = np.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = 1 + (len(xp) - N_FFT) // HOP_LENGTH
    idx = np.arange(n_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = xp[idx] * hann_window(N_FFT)
    spec = np.fft.rfft(frames, axis=-1)
    mag = (spec.real ** 2 + spec.imag ** 2)[:-1].T  # (F, T-1): drop last frame
    filters = mel_filterbank(16000, N_FFT, n_mels)
    mel = filters @ mag
    log_spec = np.log10(np.clip(mel, 1e-10, None))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def get_mel_audio(audio: np.ndarray, padding: bool = True,
                  audio_vq_ds_rate: int = 2, n_mels: int = 128) -> np.ndarray:
    """Reference get_mel_audio (whisper_encoder.py:118-127)."""
    if padding:
        reduction = HOP_LENGTH * 2 * audio_vq_ds_rate
        pad = math.ceil(len(audio) / reduction) * reduction - len(audio)
        return whisper_log_mel(audio, n_mels=n_mels, padding=pad)
    return whisper_log_mel(audio, n_mels=n_mels)


def get_T_after_cnn(l_in: int) -> int:
    """Reference whisper_encoder.py:110-115."""
    for padding, kernel_size, stride in [(1, 3, 1), (1, 3, 2)]:
        l_in = 1 + (l_in + 2 * padding - (kernel_size - 1) - 1) // stride
    return l_in


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _conv_same(x: jax.Array, w: jax.Array, b: jax.Array, stride: int = 1) -> jax.Array:
    """torch Conv1d(k=3, padding=1). x (T, C) -> (T', C)."""
    from ...nn.conv import conv1d

    xp = jnp.pad(x[None], ((0, 0), (1, 1), (0, 0)))
    return conv1d(xp, w, b, stride=stride)[0]


def _attention_block(x: jax.Array, p: dict, n_head: int, seg_mask: jax.Array) -> jax.Array:
    """Whisper residual attention block, segment-masked, packed (T, D)."""
    t, d = x.shape
    hd = d // n_head
    h = layer_norm(x, p["attn_ln_w"], p["attn_ln_b"], eps=1e-5)
    q = linear(h, p["q_w"], p["q_b"]).reshape(t, n_head, hd)
    k = linear(h, p["k_w"]).reshape(t, n_head, hd)
    v = linear(h, p["v_w"], p["v_b"]).reshape(t, n_head, hd)
    scores = jnp.einsum("thd,shd->hts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    scores = jnp.where(seg_mask[None], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("hts,shd->thd", probs, v).reshape(t, d)
    x = x + linear(attn, p["out_w"], p["out_b"])

    h = layer_norm(x, p["mlp_ln_w"], p["mlp_ln_b"], eps=1e-5)
    h = jax.nn.gelu(linear(h, p["fc1_w"], p["fc1_b"]), approximate=False)
    return x + linear(h, p["fc2_w"], p["fc2_b"])


def whisper_vq_encode(params: dict, cfg: WhisperVQEncoderConfig,
                      mel: jax.Array) -> jax.Array:
    """mel (n_mels, T_mel) single utterance -> codes (T_codes,) int32.

    Matches reference forward(return_indices=True) through the first
    `audio_vq_layers` blocks; conv runs per 200-frame chunk exactly as the
    reference splits (zero padding at chunk boundaries included).
    """
    chunks = []
    t_mel = mel.shape[1]
    win2 = cfg.n_window * 2
    pe = jnp.asarray(params["positional_embedding"])
    for start in range(0, t_mel, win2):
        piece = mel[:, start:start + win2].T  # (L, n_mels)
        h = jax.nn.gelu(_conv_same(piece, params["conv1_w"], params["conv1_b"]),
                        approximate=False)
        h = jax.nn.gelu(_conv_same(h, params["conv2_w"], params["conv2_b"], stride=2),
                        approximate=False)
        chunks.append(h + pe[: h.shape[0]])
    x = jnp.concatenate(chunks, axis=0)  # (T_cnn, D)

    t_cnn = x.shape[0]
    seg = jnp.arange(t_cnn) // cfg.n_window
    seg_mask = seg[:, None] == seg[None, :]

    for i in range(cfg.audio_vq_layers):
        x = _attention_block(x, params["blocks"][i], cfg.n_head, seg_mask)

    # downsample conv k=stride=ds_rate then nearest-codebook (GRVQ 1x1)
    from ...nn.conv import conv1d

    ds = cfg.audio_vq_ds_rate
    x = conv1d(x[None], params["vq_down_w"], params["vq_down_b"], stride=ds)[0]
    emb = jnp.asarray(params["codebook"])  # (V, D)
    x32 = x.astype(jnp.float32)
    e32 = emb.astype(jnp.float32)
    dist = (jnp.sum(jnp.square(x32), axis=1, keepdims=True)
            - 2.0 * x32 @ e32.T + jnp.sum(jnp.square(e32), axis=1)[None])
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def whisper_vq_full_output(params: dict, cfg: WhisperVQEncoderConfig,
                           mel: jax.Array) -> jax.Array:
    """Full encoder output path (reference WhisperEncoderVQ.forward without
    return_indices, speech_vq.py:283-357): run ALL layers with the VQ
    bottleneck re-expanded mid-stack (quantize -> +PE -> proj -> upsample),
    then avg-pool 2x, ln_post, proj to output_dim, and wrap with the
    bos/eos rows. Single utterance; returns (T_cnn//2 + 2, output_dim)."""
    from ...nn.conv import conv1d
    from ...nn.conv import causal_transconv1d

    chunks, pe_vq = [], []
    t_mel = mel.shape[1]
    win2 = cfg.n_window * 2
    pe = jnp.asarray(params["positional_embedding"])
    for start in range(0, t_mel, win2):
        piece = mel[:, start:start + win2].T
        h = jax.nn.gelu(_conv_same(piece, params["conv1_w"], params["conv1_b"]),
                        approximate=False)
        h = jax.nn.gelu(_conv_same(h, params["conv2_w"], params["conv2_b"], stride=2),
                        approximate=False)
        chunks.append(h + pe[: h.shape[0]])
        pe_vq.append(pe[: h.shape[0] // cfg.audio_vq_ds_rate])
    x = jnp.concatenate(chunks, axis=0)
    pe_for_vq = jnp.concatenate(pe_vq, axis=0)

    t_cnn = x.shape[0]
    seg = jnp.arange(t_cnn) // cfg.n_window
    seg_mask = seg[:, None] == seg[None, :]

    all_blocks = list(params["blocks"]) + list(params.get("post_vq_blocks", []))
    for i, blk in enumerate(all_blocks):
        x = _attention_block(x, blk, cfg.n_head, seg_mask)
        if i + 1 == cfg.audio_vq_layers:
            ds = cfg.audio_vq_ds_rate
            xq = conv1d(x[None], params["vq_down_w"], params["vq_down_b"], stride=ds)[0]
            emb = jnp.asarray(params["codebook"])
            x32, e32 = xq.astype(jnp.float32), emb.astype(jnp.float32)
            dist = (jnp.sum(jnp.square(x32), 1, keepdims=True) - 2 * x32 @ e32.T
                    + jnp.sum(jnp.square(e32), 1)[None])
            idx = jnp.argmin(dist, axis=-1)
            xq = jnp.take(emb, idx, axis=0)
            xq = xq + pe_for_vq[: xq.shape[0]]
            xq = linear(xq, params["vq_pe_proj_w"], params["vq_pe_proj_b"])
            x = causal_transconv1d(xq[None], params["vq_up_w"], params["vq_up_b"],
                                   stride=ds)[0]

    # avg pool 2x over time
    t2 = (x.shape[0] // 2) * 2
    x = jnp.mean(x[:t2].reshape(-1, 2, x.shape[-1]), axis=1)
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"], eps=1e-5)
    x = linear(x, params["proj_w"], params["proj_b"])
    bos = params["bos_eos"][0][None]
    eos = params["bos_eos"][1][None]
    return jnp.concatenate([bos, x, eos], axis=0)


def convert_whisper_vq(sd, cfg: WhisperVQEncoderConfig,
                       prefix: str = "encoder.tokenizer.") -> dict:
    """Reference WhisperEncoderVQ state dict -> pytree (encode path only)."""

    def _t(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w)))

    def _conv(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))

    g = lambda k: np.asarray(sd[prefix + k])
    blocks = []
    for i in range(cfg.audio_vq_layers):
        b = f"blocks.{i}."
        blocks.append({
            "attn_ln_w": g(b + "attn_ln.weight"), "attn_ln_b": g(b + "attn_ln.bias"),
            "q_w": _t(g(b + "attn.query.weight")), "q_b": g(b + "attn.query.bias"),
            "k_w": _t(g(b + "attn.key.weight")),
            "v_w": _t(g(b + "attn.value.weight")), "v_b": g(b + "attn.value.bias"),
            "out_w": _t(g(b + "attn.out.weight")), "out_b": g(b + "attn.out.bias"),
            "mlp_ln_w": g(b + "mlp_ln.weight"), "mlp_ln_b": g(b + "mlp_ln.bias"),
            "fc1_w": _t(g(b + "mlp.0.weight")), "fc1_b": g(b + "mlp.0.bias"),
            "fc2_w": _t(g(b + "mlp.2.weight")), "fc2_b": g(b + "mlp.2.bias"),
        })
    def _tconv(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))

    out = {
        "conv1_w": _conv(g("conv1.weight")), "conv1_b": g("conv1.bias"),
        "conv2_w": _conv(g("conv2.weight")), "conv2_b": g("conv2.bias"),
        "positional_embedding": g("positional_embedding"),
        "blocks": blocks,
        "vq_down_w": _conv(g("audio_vq_downsample.weight")),
        "vq_down_b": g("audio_vq_downsample.bias"),
        "codebook": g("audio_quantizer.rvqs.0.embed")[0],  # (V, D)
    }
    # full-output path extras (post-VQ continuation; optional for encode)
    for src, dst, conv in (
            ("project_after_vq_pe.weight", "vq_pe_proj_w", _t),
            ("project_after_vq_pe.bias", "vq_pe_proj_b", None),
            ("audio_vq_upsample.weight", "vq_up_w", _tconv),
            ("audio_vq_upsample.bias", "vq_up_b", None),
            ("ln_post.weight", "ln_post_w", None),
            ("ln_post.bias", "ln_post_b", None),
            ("proj.weight", "proj_w", _t),
            ("proj.bias", "proj_b", None),
            ("audio_bos_eos_token.weight", "bos_eos", None)):
        if prefix + src in sd:
            out[dst] = conv(g(src)) if conv else g(src)
    # remaining (post-VQ) attention blocks for the full path
    full_blocks = []
    i = cfg.audio_vq_layers
    while prefix + f"blocks.{i}.attn_ln.weight" in sd:
        b = f"blocks.{i}."
        full_blocks.append({
            "attn_ln_w": g(b + "attn_ln.weight"), "attn_ln_b": g(b + "attn_ln.bias"),
            "q_w": _t(g(b + "attn.query.weight")), "q_b": g(b + "attn.query.bias"),
            "k_w": _t(g(b + "attn.key.weight")),
            "v_w": _t(g(b + "attn.value.weight")), "v_b": g(b + "attn.value.bias"),
            "out_w": _t(g(b + "attn.out.weight")), "out_b": g(b + "attn.out.bias"),
            "mlp_ln_w": g(b + "mlp_ln.weight"), "mlp_ln_b": g(b + "mlp_ln.bias"),
            "fc1_w": _t(g(b + "mlp.0.weight")), "fc1_b": g(b + "mlp.0.bias"),
            "fc2_w": _t(g(b + "mlp.2.weight")), "fc2_b": g(b + "mlp.2.bias"),
        })
        i += 1
    out["post_vq_blocks"] = full_blocks
    return out
