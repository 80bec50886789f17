"""Masked GQA attention, XLA-native reference path.

These are the fallback/compile-anywhere implementations; the Pallas flash
kernels in `qwen3_tts_tpu.ops` replace them on real TPUs for long prefill.
Shapes follow the TPU-friendly (B, T, H, D) layout (head axis minor to time)
to keep the reshape-free path into the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-2.0**30)


def causal_mask(q_len: int, kv_len: int, offset: int = 0,
                sliding_window: int | None = None) -> jax.Array:
    """Boolean (q_len, kv_len) mask. Query position i attends key j iff
    j <= i + offset and (no window or j > i + offset - window)."""
    q_pos = jnp.arange(q_len)[:, None] + offset
    k_pos = jnp.arange(kv_len)[None, :]
    mask = k_pos <= q_pos
    if sliding_window is not None:
        mask = mask & (k_pos > q_pos - sliding_window)
    return mask


def make_prefill_mask(attention_mask: jax.Array, q_len: int,
                      sliding_window: int | None = None) -> jax.Array:
    """(B, 1, T, T) boolean mask from a (B, T) padding mask plus causality."""
    cm = causal_mask(q_len, q_len, 0, sliding_window)  # (T, T)
    pad = attention_mask.astype(bool)[:, None, None, :]  # (B,1,1,T)
    return cm[None, None] & pad


def gqa_attention_quant(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                        v_q: jax.Array, v_s: jax.Array,
                        mask: jax.Array | None, scaling: float) -> jax.Array:
    """GQA over an int8-quantized KV cache with per-slot scales.

    q: (B, T, H, D); k_q/v_q: (B, S, H_kv, D) int8; k_s/v_s: (B, S, H_kv).
    The scales are folded OUTSIDE the dots — scores = (q . k_q) * k_s and
    ctx = (probs * v_s) . v_q — mathematically exact per-slot dequant
    without ever materializing a bf16 copy of the cache (the int8->bf16
    convert fuses into the dot operand reads like the int8 weight path)."""
    b, t, h, d = q.shape
    h_kv = k_q.shape[2]
    g = h // h_kv
    q = q.reshape(b, t, h_kv, g, d)

    scores = jnp.einsum("bthgd,bshd->bhgts", q, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * scaling
    # per-slot k scale: (B, S, H_kv) -> (B, H_kv, 1, 1, S)
    scores = scores * jnp.transpose(k_s, (0, 2, 1)).astype(
        jnp.float32)[:, :, None, None, :]
    if mask is not None:
        if mask.ndim == 4:  # (B, 1, T, S) -> (B, 1, 1, T, S)
            mask = mask[:, :, None]
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs * jnp.transpose(v_s, (0, 2, 1)).astype(
        jnp.float32)[:, :, None, None, :]
    out_dtype = q.dtype
    out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(out_dtype),
                     v_q.astype(out_dtype))
    return out.reshape(b, t, h, d).astype(out_dtype)


def gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: jax.Array | None, scaling: float) -> jax.Array:
    """Grouped-query attention.

    q: (B, T, H, D); k/v: (B, S, H_kv, D); mask: broadcastable to (B, H_kv, G, T, S)
    or (B, 1, T, S). Returns (B, T, H, D). Softmax in float32
    (reference eager_attention_forward, modeling_qwen3_tts.py:634-657).
    """
    b, t, h, d = q.shape
    h_kv = k.shape[2]
    g = h // h_kv
    q = q.reshape(b, t, h_kv, g, d)

    # scores: (B, H_kv, G, T, S)
    scores = jnp.einsum("bthgd,bshd->bhgts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scaling
    if mask is not None:
        if mask.ndim == 4:  # (B, 1, T, S) -> (B, 1, 1, T, S)
            mask = mask[:, :, None]
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v)
    return out.reshape(b, t, h, d)
