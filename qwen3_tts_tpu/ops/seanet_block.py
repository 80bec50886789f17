"""Fused Pallas kernel for one FULL SEANet DecoderBlock unit-chain of the
12Hz vocoder: the block's three residual units

    u_i+1 = u_i + conv_k1(snake(conv_k7_dil(snake(u_i))))   (dil = 1, 3, 9)

run back-to-back with the activation window VMEM-RESIDENT across the whole
chain (reference modeling_qwen3_tts_tokenizer_v2.py:618-634,577-895; XLA
path models/codec_decoder.py::residual_unit).

Why per-BLOCK (r4 verdict next-round #2): the per-UNIT fused kernel
(ops/seanet_unit.py, r3) still paid one HBM read + write per unit and was
retired on hardware evidence; the XLA path pays ~2 HBM traversals per unit
(snake fuses into the conv read) — ~6 per block. This kernel pays exactly
ONE read and ONE write per block, and realizes each dilated k7 conv as 7
SHIFTED VMEM READS on the sublane (time) axis, each feeding a full-tile
(T, C)@(C, C) MXU dot — sublane shifts are supported by Mosaic (proven in
the r3 unit kernel), unlike the lane-concat formulation it rejected
("result/input offset mismatch").

Geometry: chained causality needs 6*(1+3+9) = 78 rows of left context per
output tile, padded to CTX_PAD = 80 for sublane alignment. With offsets
  u1 valid from row 8, u2 from 26, u3 (= output) from 80
every tap slice is statically in-bounds (see the derivation in the grid
body). Channels pad to a 128-lane multiple; zero padding is exact through
the chain (snake(0) = 0, zero weight rows/cols, zero skip).

Numerics match models/codec_decoder.residual_unit: dots accumulate f32,
snake in f32, intermediates stored bf16. Parity asserted in
tests/test_seanet_block.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9)
CTX = 6 * sum(DILATIONS)       # 78 rows of chained causal context
CTX_PAD = -(-CTX // 8) * 8     # 80: sublane-aligned window overhang
_OFF = (8, 26, CTX_PAD)        # first valid output row of u1 / u2 / u3

# T_TILE by (padded) channel count: bounded VMEM, long-M MXU pipelines
_T_TILE = {768: 512, 384: 1024, 256: 1024, 128: 2048}


def _block_kernel(xp_ref, w7_ref, b7_ref, w1_ref, b1_ref, act_ref, out_ref,
                  xbuf, ubuf, sem, *, c: int, t_tile: int, n_units: int,
                  dils: tuple, diag: str = ""):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    l0 = t_tile + CTX_PAD

    cp = pltpu.make_async_copy(
        xp_ref.at[bi, pl.ds(ti * t_tile, l0)], xbuf, sem)
    cp.start()
    cp.wait()

    def snake(v, a_row, b_row):
        from ..models.codec_decoder import fast_sin

        if diag == "nosnake":  # diagnostic: isolate VPU transcendental cost
            return v.astype(jnp.float32)
        a = jnp.exp(a_row.astype(jnp.float32))[None, :]
        b = jnp.exp(b_row.astype(jnp.float32))[None, :]
        vf = v.astype(jnp.float32)
        sin = jnp.sin if diag == "slowsin" else fast_sin
        return vf + (1.0 / (b + 1e-9)) * jnp.square(sin(vf * a))

    u_prev = xbuf[:]  # (L0, C) bf16; valid rows [0, L0)
    off_in = 0
    for u in range(n_units):
        d = dils[u]
        off_out = _OFF[u]
        l_out = l0 - off_out
        h = snake(u_prev, act_ref[u, 0], act_ref[u, 1]).astype(jnp.bfloat16)
        # dilated k7 conv: tap j of output row r reads h[off_out-(6-j)*d+r];
        # the minimum index is off_out - 6*d >= off_in by the _OFF schedule,
        # so every slice is statically in-bounds
        acc = jnp.broadcast_to(b7_ref[u].astype(jnp.float32), (l_out, c))
        taps = (1,) if diag == "tap1" else range(7)  # diag: slice+dot cost
        for j in taps:
            start = off_out - (6 - j) * d
            tap = jax.lax.slice_in_dim(h, start, start + l_out, axis=0)
            w_j = jax.lax.slice_in_dim(w7_ref[u], j * c, (j + 1) * c, axis=0)
            acc = acc + jnp.dot(tap, w_j, preferred_element_type=jnp.float32)
        y = snake(acc, act_ref[u, 2], act_ref[u, 3]).astype(jnp.bfloat16)
        y = jnp.dot(y, w1_ref[u], preferred_element_type=jnp.float32)
        y = y + b1_ref[u].astype(jnp.float32)[None, :]
        skip = jax.lax.slice_in_dim(u_prev, off_out, l0, axis=0
                                    ).astype(jnp.float32)
        out_u = (skip + y).astype(jnp.bfloat16)
        if u == n_units - 1:
            out_ref[0] = out_u.astype(out_ref.dtype)
        else:
            # stage buffer: rows [off_out, L0) valid; the next unit's taps
            # never read below its own off_out - 6*d >= this off_out
            ubuf[pl.ds(off_out, l_out)] = out_u

            # causal boundary: on the FIRST tile the context rows represent
            # global t < 0 — the XLA chain zero-pads each unit's POST-snake
            # input there (causal_conv1d), and snake(0) == 0, so the stage
            # context must be exactly zero, not the unit applied to zeros
            # (whose conv biases make it nonzero)
            @pl.when(ti == 0)
            def _zero_ctx():
                ubuf[pl.ds(0, CTX_PAD)] = jnp.zeros((CTX_PAD, c),
                                                    jnp.bfloat16)

            u_prev = ubuf[:]
            off_in = off_out


@functools.partial(jax.jit, static_argnames=("interpret", "diag", "t_tile"))
def fused_block_units(x: jax.Array, units: tuple, interpret: bool = False,
                      diag: str = "", t_tile: int = 0) -> jax.Array:
    """Run a DecoderBlock's three residual units fused.

    x: (B, T, C); units: tuple of 3 param dicts (conv1_w (7,C,C), conv1_b,
    conv2_w (1,C,C), conv2_b, act1/2_alpha/beta (C,)), dilations (1,3,9).
    Returns (B, T, C) matching the XLA residual_unit chain."""
    b, t, c = x.shape
    cp_ = -(-c // 128) * 128
    t_tile = t_tile or _T_TILE.get(cp_, 1024)
    n_tiles = -(-t // t_tile)
    t_pad = n_tiles * t_tile

    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (CTX_PAD, t_pad - t), (0, cp_ - c)))

    def stack(name, fn):
        return jnp.stack([fn(u[name]) for u in units])

    def pad7(w):  # (7, c, c) -> (7*cp_, cp_)
        w = jnp.pad(jnp.asarray(w, jnp.bfloat16),
                    ((0, 0), (0, cp_ - c), (0, cp_ - c)))
        return w.reshape(7 * cp_, cp_)

    def pad1(w):  # (1, c, c) -> (cp_, cp_)
        return jnp.pad(jnp.asarray(w[0], jnp.bfloat16),
                       ((0, cp_ - c), (0, cp_ - c)))

    def padv(v):  # (c,) -> (cp_,)
        return jnp.pad(jnp.asarray(v, jnp.bfloat16), (0, cp_ - c))

    w7 = stack("conv1_w", pad7)                      # (3, 7C, C)
    b7 = stack("conv1_b", padv)                      # (3, C)
    w1 = stack("conv2_w", pad1)                      # (3, C, C)
    b1 = stack("conv2_b", padv)                      # (3, C)
    act = jnp.stack([jnp.stack([padv(u["act1_alpha"]), padv(u["act1_beta"]),
                                padv(u["act2_alpha"]), padv(u["act2_beta"])])
                     for u in units])                # (3, 4, C)

    kernel = functools.partial(_block_kernel, c=cp_, t_tile=t_tile,
                               n_units=len(units), dils=DILATIONS, diag=diag)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cp_), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 5,
        out_specs=pl.BlockSpec((1, t_tile, cp_), lambda bi, ti: (bi, ti, 0)),
        scratch_shapes=[
            pltpu.VMEM((t_tile + CTX_PAD, cp_), jnp.bfloat16),
            pltpu.VMEM((t_tile + CTX_PAD, cp_), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # scratch (x + stage buffers) + stacked weights + out block +
            # ~50% Mosaic working slack; the default 16 MB scoped limit
            # rejects t_tile >= 4096 otherwise
            vmem_limit_bytes=min(int(1.5 * (
                3 * (t_tile + CTX_PAD) * cp_ * 2
                + 3 * 8 * cp_ * cp_ * 2 + 3 * 6 * cp_ * 2
                + t_tile * cp_ * 2)) + (8 << 20), 110 << 20)),
        interpret=interpret,
    )(xp, w7, b7, w1, b1, act)
    return out[:, :t, :c]
