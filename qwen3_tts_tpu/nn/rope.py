"""Rotary position embeddings (1D and the multimodal 3-axis variant).

The reference talker uses mRoPE (3-axis) positions, but for the TTS task the
three axes always carry identical positions — get_rope_index just cumsums the
attention mask (reference modeling_qwen3_tts.py:1794-1800). With identical
per-axis positions, section-wise mRoPE reduces exactly to 1D RoPE, so the TPU
decode path uses 1D tables; `apply_mrope` is kept for full parity when a
checkpoint ships heterogeneous positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_inv_freq(head_dim: int, theta: float) -> jax.Array:
    """float32 inverse frequencies, shape (head_dim//2,)."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def rope_cos_sin(positions: jax.Array, inv_freq: jax.Array, dtype=jnp.float32):
    """cos/sin tables for given integer positions.

    positions: (..., T) int array. Returns cos, sin of shape (..., T, head_dim)
    computed in float32 then cast (reference forces float32:
    modeling_qwen3_tts.py:553-558).
    """
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """Apply RoPE. q/k: (B, T, H, D); cos/sin: (B, T, D) broadcast over heads."""
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot, k_rot


def apply_mrope(q, k, cos3, sin3, mrope_section, interleaved: bool = False):
    """Section-wise multimodal RoPE (reference modeling_qwen3_tts.py:660-724).

    cos3/sin3: (3, B, T, D). mrope_section: per-axis channel counts over D/2.
    With identical positions across the 3 axes this equals `apply_rope`.
    """
    if interleaved:
        # interleave channels across modalities within the first half
        dim = cos3.shape[-1]
        half = dim // 2
        n_mod = len(mrope_section)
        cos_h, sin_h = cos3[..., :half], sin3[..., :half]

        def build(x):
            out = x[0]
            for i in range(1, n_mod):
                end = mrope_section[i] * n_mod
                idx = jnp.arange(i, end, n_mod)
                out = out.at[..., idx].set(jnp.take(x[i], idx, axis=-1))
            return jnp.concatenate([out, out], axis=-1)

        cos = build(cos_h)
        sin = build(sin_h)
    else:
        sections = list(mrope_section) * 2
        cos_parts, sin_parts = [], []
        start = 0
        for i, sec in enumerate(sections):
            cos_parts.append(cos3[i % 3, ..., start:start + sec])
            sin_parts.append(sin3[i % 3, ..., start:start + sec])
            start += sec
        cos = jnp.concatenate(cos_parts, axis=-1)
        sin = jnp.concatenate(sin_parts, axis=-1)
    return apply_rope(q, k, cos, sin)
