"""Static-shape KV cache for XLA-friendly autoregressive decoding.

The reference relies on HF DynamicCache (unbounded python-managed tensors,
`_supports_static_cache=False`, reference modeling_qwen3_tts.py:476). On TPU
everything under jit must be static-shape, so the cache is a preallocated
(L, B, S_max, H_kv, D) buffer pair plus a scalar write index; padding is
handled by attention masks, not by ragged shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, S_max, H_kv, D)
    v: jax.Array  # (L, B, S_max, H_kv, D)
    index: jax.Array  # scalar int32: number of positions written
    # int8 cache only (k/v dtype int8): per-slot max-abs scales. The
    # attention path folds them into the score/context dots — scores =
    # (q . k_q) * k_scale and ctx = (p * v_scale) . v_q — so the int8->bf16
    # converts fuse into the dots and the dequantized cache is never
    # materialized. Halves the dominant HBM term of the serving decode step
    # (KV read was 3.7 GB of the ~5.2 GB/step roofline at b=64, r3 notes).
    k_scale: jax.Array | None = None  # (L, B, S_max, H_kv) bf16
    v_scale: jax.Array | None = None  # (L, B, S_max, H_kv) bf16

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(cls, num_layers: int, batch: int, max_len: int, num_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
        quant = dtype == jnp.int8
        return cls(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            index=jnp.zeros((), dtype=jnp.int32),
            k_scale=jnp.zeros(shape[:-1], jnp.bfloat16) if quant else None,
            v_scale=jnp.zeros(shape[:-1], jnp.bfloat16) if quant else None,
        )


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., D) bf16 -> (int8 values, (...,) bf16 max-abs/127 scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def cache_update_layer(cache: KVCache, layer: int, k_new: jax.Array,
                       v_new: jax.Array) -> tuple[jax.Array, jax.Array, KVCache]:
    """Write k/v for `layer` at the current index; returns full-layer k/v views.

    k_new/v_new: (B, T, H_kv, D). The caller advances `index` once per step via
    `advance` (so all layers share one index).
    """
    idx = cache.index
    k_buf = jax.lax.dynamic_update_slice(cache.k[layer], k_new.astype(cache.k.dtype), (0, idx, 0, 0))
    v_buf = jax.lax.dynamic_update_slice(cache.v[layer], v_new.astype(cache.v.dtype), (0, idx, 0, 0))
    new_cache = cache._replace(
        k=cache.k.at[layer].set(k_buf),
        v=cache.v.at[layer].set(v_buf),
    )
    return k_buf, v_buf, new_cache


def advance(cache: KVCache, n: int) -> KVCache:
    return cache._replace(index=cache.index + n)
