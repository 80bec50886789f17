"""Core functional NN primitives.

All layers are pure functions over parameter pytrees (nested dicts of
jnp arrays). Dtype discipline follows the reference numerics:
RMSNorm statistics and RoPE tables in float32, matmuls in the params'
dtype (bf16 on TPU) with float32 accumulation where it matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with forced float32 statistics (reference modeling_qwen3_tts.py:595-610)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (weight * normed.astype(dtype)).astype(dtype)


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """x @ w (+ b). Weights stored as (in, out) — transposed from the torch
    (out, in) layout at load time so the hot path is a plain matmul."""
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def swiglu_mlp(x: jax.Array, p: dict) -> jax.Array:
    """SwiGLU MLP: down(silu(gate(x)) * up(x))
    (reference modeling_qwen3_tts.py:842-855)."""
    g = jax.nn.silu(linear(x, p["gate_proj"]))
    u = linear(x, p["up_proj"])
    return linear(g * u, p["down_proj"])


def resize_mlp(x: jax.Array, p: dict) -> jax.Array:
    """Two-layer bridge MLP with bias + silu (text_projection)
    (reference modeling_qwen3_tts.py:808-816)."""
    h = jax.nn.silu(linear(x, p["fc1"], p.get("fc1_b")))
    return linear(h, p["fc2"], p.get("fc2_b"))


def embed(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Embedding lookup."""
    return jnp.take(table, ids, axis=0)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Standard LayerNorm (used by ConvNeXt blocks), float32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed.astype(dtype) * weight + bias).astype(dtype)
