"""ECAPA-TDNN speaker encoder, TPU-native.

Reference: Qwen3TTSSpeakerEncoder (modeling_qwen3_tts.py:95-393):
initial TDNN -> 3x SE-Res2Net blocks -> multi-layer feature aggregation ->
attentive statistics pooling -> 1x1 conv to the 1024-d embedding (which is
injected directly as a codec-embedding row in the talker prompt).

All convs use 'same' padding with reflect mode, matching torch
padding_mode="reflect". Data layout is NWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SpeakerEncoderConfig
from ..nn.conv import conv1d


def conv1d_same_reflect(x: jax.Array, w: jax.Array, b: jax.Array | None,
                        dilation: int = 1) -> jax.Array:
    """'same' conv with reflect padding (odd kernels)."""
    k = w.shape[0]
    total = (k - 1) * dilation
    left = total // 2
    right = total - left
    if total > 0:
        x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    return conv1d(x, w, b, dilation=dilation)


def tdnn_block(x: jax.Array, p: dict, dilation: int = 1) -> jax.Array:
    return jax.nn.relu(conv1d_same_reflect(x, p["w"], p["b"], dilation))


def res2net_block(x: jax.Array, p: dict, scale: int, dilation: int) -> jax.Array:
    """Hierarchical grouped convolutions (reference :95-126)."""
    chunks = jnp.split(x, scale, axis=-1)
    outs = [chunks[0]]
    prev = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + prev
        prev = tdnn_block(inp, p["blocks"][i - 1], dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def se_block(x: jax.Array, p: dict) -> jax.Array:
    """Squeeze-excitation over time mean (reference :129-156)."""
    s = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
    s = jax.nn.relu(conv1d(s, p["conv1_w"], p["conv1_b"]))
    s = jax.nn.sigmoid(conv1d(s, p["conv2_w"], p["conv2_b"]))
    return x * s


def se_res2net_block(x: jax.Array, p: dict, scale: int, dilation: int) -> jax.Array:
    h = tdnn_block(x, p["tdnn1"])
    h = res2net_block(h, p["res2net"], scale, dilation)
    h = tdnn_block(h, p["tdnn2"])
    h = se_block(h, p["se"])
    return h + x


def attentive_stats_pooling(x: jax.Array, p: dict, eps: float = 1e-12) -> jax.Array:
    """Attentive statistics pooling (reference :159-245). x: (B, T, C)."""
    t = x.shape[1]
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip(var, eps, None))
    global_ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1)
    attn = tdnn_block(global_ctx, p["tdnn"])
    attn = conv1d(jnp.tanh(attn), p["conv_w"], p["conv_b"])  # (B, T, C)
    attn = jax.nn.softmax(attn, axis=1)
    mean_w = jnp.sum(attn * x, axis=1)
    std_w = jnp.sqrt(jnp.clip(jnp.sum(attn * jnp.square(x - mean_w[:, None]), axis=1),
                              eps, None))
    return jnp.concatenate([mean_w, std_w], axis=-1)  # (B, 2C)


def speaker_encode(params: dict, cfg: SpeakerEncoderConfig, mels: jax.Array) -> jax.Array:
    """mels (B, T, mel_dim) log-mel -> (B, enc_dim) speaker embedding."""
    feats = []
    h = tdnn_block(mels, params["blocks"][0], cfg.enc_dilations[0])
    feats.append(h)
    for i in range(1, len(cfg.enc_channels) - 1):
        h = se_res2net_block(h, params["blocks"][i], cfg.enc_res2net_scale,
                             cfg.enc_dilations[i])
        feats.append(h)
    h = jnp.concatenate(feats[1:], axis=-1)
    h = tdnn_block(h, params["mfa"], cfg.enc_dilations[-1])
    pooled = attentive_stats_pooling(h, params["asp"])  # (B, 2C)
    out = conv1d(pooled[:, None, :], params["fc_w"], params["fc_b"])  # 1x1
    return out[:, 0]


def convert_speaker_encoder(sd, cfg: SpeakerEncoderConfig,
                            prefix: str = "speaker_encoder.") -> dict:
    """Reference state-dict -> pytree (torch conv (O,I,K) -> (K,I,O))."""
    import numpy as np

    g = lambda k: np.asarray(sd[prefix + k])
    c = lambda k: np.ascontiguousarray(np.transpose(g(k), (2, 1, 0)))

    def tdnn(base):
        return {"w": c(base + ".conv.weight"), "b": g(base + ".conv.bias")}

    blocks = [tdnn("blocks.0")]
    for i in range(1, len(cfg.enc_channels) - 1):
        b = f"blocks.{i}"
        blocks.append({
            "tdnn1": tdnn(b + ".tdnn1"),
            "res2net": {"blocks": [tdnn(b + f".res2net_block.blocks.{j}")
                                   for j in range(cfg.enc_res2net_scale - 1)]},
            "tdnn2": tdnn(b + ".tdnn2"),
            "se": {
                "conv1_w": c(b + ".se_block.conv1.weight"),
                "conv1_b": g(b + ".se_block.conv1.bias"),
                "conv2_w": c(b + ".se_block.conv2.weight"),
                "conv2_b": g(b + ".se_block.conv2.bias"),
            },
        })
    return {
        "blocks": blocks,
        "mfa": tdnn("mfa"),
        "asp": {
            "tdnn": tdnn("asp.tdnn"),
            "conv_w": c("asp.conv.weight"),
            "conv_b": g("asp.conv.bias"),
        },
        "fc_w": c("fc.weight"),
        "fc_b": g("fc.bias"),
    }
