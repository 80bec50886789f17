"""Fused Pallas kernel for one SEANet residual unit of the 12Hz vocoder.

Replaces, in ONE dispatch per unit:
    snake_beta -> causal dilated k7 conv -> snake_beta -> k1 conv -> + skip
(reference modeling_qwen3_tts_tokenizer_v2.py:618-634; XLA path
models/codec_decoder.py::residual_unit).

Why a kernel: the SEANet stack is 95% of the vocoder's 1122 ms serving
chunk and `lax.conv_general_dilated` runs its 48/96/192-channel 1D convs
at ~2-10% MFU (r3 measurement, examples/bench_conv1d.py — tap-wise matmul
in XLA is 2x worse and NHWC identical, so no graph-level rewrite helps).
Here each grid program:

  - DMAs one (T_TILE + halo, C) input window from HBM (the input is
    left-padded by `halo` once in XLA so every window is uniform);
  - applies snake_beta in f32 on the VPU;
  - UNFOLDS the k taps into a (T_TILE, k*C) matrix with static shifts and
    runs the dilated conv as a single MXU dot against the (k*C, C)
    repacked weight — contraction k*C >= 336 fills the MXU's K dimension
    where the conv path's effective K=C underfills it;
  - second snake + (C, C) pointwise dot + skip, all without touching HBM.

Weights live whole in VMEM (k*C*C bf16 <= 2.1 MB at C=384). Activation
traffic drops from ~8 HBM traversals per unit (4 op outputs read+written)
to one read + one write.

Numerics: dots accumulate in f32 (the XLA conv path also accumulates f32
internally); snake in f32 exactly like models/codec_decoder.snake_beta.
Parity vs the XLA unit is asserted in tests/test_codec_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 1024


def _unit_kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 a1_ref, be1_ref, a2_ref, be2_ref, out_ref,
                 xbuf, sem, *, c: int, k: int, dilation: int, halo: int,
                 halo_pad: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    start = ti * T_TILE  # window start in the PADDED input = causal halo base

    # window length must be sublane(8)-aligned, so the causal halo is
    # rounded up to halo_pad and taps index from (halo_pad - halo)
    cp = pltpu.make_async_copy(
        xp_ref.at[bi, pl.ds(start, T_TILE + halo_pad)], xbuf, sem)
    cp.start()
    cp.wait()
    xw = xbuf[:]  # (T_TILE + halo_pad, C) bf16

    def snake(v, a_ref, b_ref):
        a = jnp.exp(a_ref[0].astype(jnp.float32))[None, :]
        b = jnp.exp(b_ref[0].astype(jnp.float32))[None, :]
        vf = v.astype(jnp.float32)
        return vf + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(vf * a))

    h = snake(xw, a1_ref, be1_ref).astype(jnp.bfloat16)  # (T_TILE+halo, C)
    # dilated k-tap conv as k accumulated MXU dots: tap j of output row t
    # reads padded row (t + j*dilation); j == k-1 is the current sample
    # (causal left pad). Lane-concatenating the shifted taps into one
    # (T_TILE, k*C) operand would fill the MXU's K dim better but Mosaic
    # rejects concat/rotate on these layouts ("result/input offset
    # mismatch" / bf16 rotate unimplemented); the accumulated small-K dots
    # still keep everything in VMEM and beat the XLA conv path.
    base = halo_pad - halo
    y = b1_ref[0].astype(jnp.float32)[None, :] * jnp.ones(
        (T_TILE, 1), jnp.float32)
    for j in range(k):
        tap = jax.lax.slice_in_dim(h, base + j * dilation,
                                   base + j * dilation + T_TILE, axis=0)
        w_j = jax.lax.slice_in_dim(w1_ref[:], j * c, (j + 1) * c, axis=0)
        y = y + jnp.dot(tap, w_j, preferred_element_type=jnp.float32)

    y = snake(y, a2_ref, be2_ref).astype(jnp.bfloat16)
    y = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)[None, :]

    skip = xw[halo_pad:, :].astype(jnp.float32)
    out_ref[0] = (skip + y).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_residual_unit(x: jax.Array, p: dict, dilation: int,
                        interpret: bool = False) -> jax.Array:
    """x: (B, T, C); p: the XLA residual-unit param dict (conv1_w (k,C,C),
    conv1_b, conv2_w (1,C,C), conv2_b, act1/2_alpha/beta (C,)).
    Returns (B, T, C), matching models/codec_decoder.residual_unit."""
    b, t, c = x.shape
    k = p["conv1_w"].shape[0]
    halo = (k - 1) * dilation
    halo_pad = -(-halo // 8) * 8
    n_tiles = -(-t // T_TILE)
    t_pad = n_tiles * T_TILE
    # lane (channel) dim must be 128-aligned for the HBM window DMA; zero
    # padding is exact through the unit (snake(0)=0, zero weight rows/cols)
    cp_ = -(-c // 128) * 128

    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (halo_pad, t_pad - t), (0, cp_ - c)))

    def padw(w):  # (k, c, c) -> (k*cp_, cp_)
        kk = w.shape[0]
        w = jnp.pad(jnp.asarray(w, jnp.bfloat16),
                    ((0, 0), (0, cp_ - c), (0, cp_ - c)))
        return w.reshape(kk * cp_, cp_)

    def padv(v):  # (c,) -> (1, cp_)
        return jnp.pad(jnp.asarray(v, jnp.bfloat16), (0, cp_ - c)).reshape(1, cp_)

    kernel = functools.partial(_unit_kernel, c=cp_, k=k, dilation=dilation,
                               halo=halo, halo_pad=halo_pad)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cp_), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 8,
        out_specs=pl.BlockSpec((1, T_TILE, cp_), lambda bi, ti: (bi, ti, 0)),
        scratch_shapes=[
            pltpu.VMEM((T_TILE + halo_pad, cp_), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, padw(p["conv1_w"]), padv(p["conv1_b"]),
      padw(p["conv2_w"])[:cp_], padv(p["conv2_b"]),
      padv(p["act1_alpha"]), padv(p["act1_beta"]),
      padv(p["act2_alpha"]), padv(p["act2_beta"]))
    return out[:, :t, :c]
