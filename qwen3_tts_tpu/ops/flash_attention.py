"""Pallas TPU flash attention (prefill path).

Replaces the reference's FlashAttention-2 CUDA dependency
(reference whisper_encoder.py:29-36 and HF attn_implementation switches)
with a TPU kernel: online-softmax over KV tiles, causal + sliding-window +
left-padding masks, GQA via q-head grouping. Layout (B, T, H, D); the
grid walks (batch*q_heads, q_tiles) with the KV loop inside the kernel so
each q tile streams KV tiles through VMEM once.

The XLA fallback (`nn.attention.gqa_attention`) remains the reference
implementation; `flash_attention` switches in when running on real TPU and
shapes meet the tile constraints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0 ** 30


def _flash_kernel(q_ref, k_ref, v_ref, pad_ref, o_ref, *, q_tile: int,
                  kv_tile: int, kv_len: int, scaling: float,
                  sliding_window: int | None, causal: bool):
    """One (batch·head, q_tile) program: stream KV tiles with online softmax.

    q_ref: (q_tile, D); k_ref/v_ref: (kv_len, D); pad_ref: (1, kv_len) int32;
    o_ref: (q_tile, D).
    """
    qi = pl.program_id(1)
    q = q_ref[:].astype(jnp.float32) * scaling
    d = q.shape[-1]

    m = jnp.full((q_tile, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((q_tile, 1), jnp.float32)
    acc = jnp.zeros((q_tile, d), jnp.float32)

    q_pos = qi * q_tile + jax.lax.broadcasted_iota(jnp.int32, (q_tile, kv_tile), 0)

    num_kv_tiles = kv_len // kv_tile

    def body(kv_i, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(kv_i * kv_tile, kv_tile), :].astype(jnp.float32)
        v = v_ref[pl.ds(kv_i * kv_tile, kv_tile), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (qt, kt)

        k_pos = kv_i * kv_tile + jax.lax.broadcasted_iota(
            jnp.int32, (q_tile, kv_tile), 1)
        mask = pad_ref[0, pl.ds(kv_i * kv_tile, kv_tile)][None, :] > 0
        if causal:
            mask = mask & (k_pos <= q_pos)
        if sliding_window is not None:
            mask = mask & (k_pos > q_pos - sliding_window)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv_tiles, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scaling", "sliding_window",
                                             "causal", "q_tile", "kv_tile",
                                             "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    pad_mask: jax.Array, *, scaling: float,
                    sliding_window: int | None = None, causal: bool = True,
                    q_tile: int = 128, kv_tile: int = 128,
                    interpret: bool = False) -> jax.Array:
    """q: (B, T, H, D); k/v: (B, S, H_kv, D); pad_mask: (B, S) validity.
    T and S must be multiples of the tile sizes (callers pad; padded query
    rows produce garbage that callers slice off)."""
    b, t, h, d = q.shape
    s = k.shape[1]
    h_kv = k.shape[2]
    group = h // h_kv

    # layout: fold heads into batch; map q head -> kv head by grouping
    qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, t, d)
    kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h_kv, s, d)
    vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h_kv, s, d)

    kernel = functools.partial(
        _flash_kernel, q_tile=q_tile, kv_tile=kv_tile, kv_len=s,
        scaling=scaling, sliding_window=sliding_window, causal=causal)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, t // q_tile),
        in_specs=[
            pl.BlockSpec((None, q_tile, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i // group, 0, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i // group, 0, 0)),
            pl.BlockSpec((None, 1, s), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, q_tile, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, pad_mask.astype(jnp.int32)[:, None, :])

    return jnp.transpose(out.reshape(b, h, t, d), (0, 2, 1, 3))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_prefill_attention(q, k, v, pad_mask, scaling,
                            sliding_window=None, interpret=False):
    """Shape-safe wrapper: pads T/S to tile multiples and slices the result.
    Falls back to the XLA path for tiny sequences."""
    b, t, h, d = q.shape
    s = k.shape[1]
    if t < 128 or d % 128 != 0 and d not in (64, 128, 256):
        from ..nn.attention import gqa_attention, make_prefill_mask

        mask = make_prefill_mask(pad_mask[:, :s], t, sliding_window)
        return gqa_attention(q, k, v, mask, scaling)

    tp = round_up(t, 128)
    sp = round_up(s, 128)
    qp = jnp.pad(q, ((0, 0), (0, tp - t), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sp - s), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sp - s), (0, 0), (0, 0)))
    pm = jnp.pad(pad_mask, ((0, 0), (0, sp - s)))
    out = flash_attention(qp, kp, vp, pm, scaling=scaling,
                          sliding_window=sliding_window, interpret=interpret)
    return out[:, :t]
