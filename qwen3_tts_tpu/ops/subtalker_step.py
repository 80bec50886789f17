"""Fused Pallas TPU kernel for one code-predictor ("sub-talker") micro-step.

The reference runs 15 sequential HF `generate` steps of a 5-layer mini
decoder per audio frame (reference modeling_qwen3_tts.py:1670-1686,
1249-1312). On TPU the XLA decode path spends ~2x the HBM-bandwidth floor
on this loop: each micro-step issues ~75 small ops whose weight reads are
poorly pipelined. This kernel runs ONE full micro-step (all 5 layers +
final norm) inside a single Pallas program:

  - int8 weight-only weights live in HBM, pre-packed into uniform
    (1024, 1024) tiles (15 per layer), and are streamed tile-by-tile into a
    2-slot VMEM scratch with manual async-copy double buffering — the DMA
    of tile i+1 overlaps the MXU matmul of tile i, so the step runs at the
    weight-bandwidth floor (~79 MB/step int8).
  - the tiny KV cache (<= 17 live positions) is copied per layer HBM->VMEM,
    the new position is written back as a 1-slot DMA, and attention
    (GQA 16q/8kv, RoPE, q/k-RMSNorm) runs entirely on-chip.
  - per-output-channel dequantization scales are folded into the matmul
    *output* (y = (x @ w_int8) * s), so the VPU cost per tile is a single
    int8->bf16 convert instead of convert+multiply over the full tile.

Sampling (lm_head, top-k/top-p, RNG) stays at the XLA level between
micro-steps; the kernel covers only the bandwidth-bound layer stack.

Layout assumptions (assert-checked): hidden 1024, intermediate 3072,
16 q heads / 8 kv heads, head_dim 128 — the production code-predictor
config for both the 1.7B and 0.6B families
(reference configuration_qwen3_tts.py:70-256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 1024            # hidden size
INTER = 3072        # MLP intermediate
NQ, NKV, D = 16, 8, 128
QD = NQ * D         # 2048
TILE = 1024         # square weight tile edge
NTILES = 15         # tiles per layer: 4 qkv + 2 o + 6 gate_up + 3 down
CACHE_S = 32        # padded KV slots (>= 17 live)

# per-layer tile schedule: (source matrix, tile role)
#   t 0-3   qkv_proj   (H, 4096)  out-column chunks  [q0 q1 | k | v]
#   t 4-5   o_proj     (2048, H)  in-row chunks (accumulated)
#   t 6-11  gate_up    (H, 6144)  out-column chunks  [g0 g1 g2 | u0 u1 u2]
#   t 12-14 down_proj  (3072, H)  in-row chunks (accumulated)


def pack_predictor_weights(layers: dict, final_norm: jax.Array) -> dict:
    """Pack fused+int8-quantized predictor layer weights into the kernel's
    uniform tile layout.

    Expects the stacked layout produced by `fuse_stack_params` +
    `quantize_stack_params`: qkv_proj_q (L,1024,4096) int8 with per-out-col
    scales (L,1,4096), o_proj_q (L,2048,1024), gate_up_proj_q (L,1024,6144),
    down_proj_q (L,3072,1024), plus the norm vectors.
    """
    if "qkv_proj_q" not in layers:
        raise ValueError("packed sub-talker kernel requires fused + int8 "
                         "weights (fuse_talker_params + quantize_talker_params)")
    L = layers["qkv_proj_q"].shape[0]
    if (layers["qkv_proj_q"].shape != (L, H, QD + 2 * NKV * D)
            or layers["gate_up_proj_q"].shape != (L, H, 2 * INTER)):
        raise ValueError(
            "packed sub-talker kernel supports the production code-predictor "
            f"layout only (hidden {H}, intermediate {INTER}, {NQ}q/{NKV}kv "
            f"heads, head_dim {D}); got qkv {layers['qkv_proj_q'].shape}, "
            f"gate_up {layers['gate_up_proj_q'].shape}")

    qkv = layers["qkv_proj_q"]
    o = layers["o_proj_q"]
    gu = layers["gate_up_proj_q"]
    down = layers["down_proj_q"]

    tiles = []
    scales = []
    for t in range(4):
        tiles.append(qkv[:, :, t * TILE:(t + 1) * TILE])
        scales.append(layers["qkv_proj_s"][:, 0, t * TILE:(t + 1) * TILE])
    for t in range(2):
        tiles.append(o[:, t * TILE:(t + 1) * TILE, :])
        scales.append(layers["o_proj_s"][:, 0, :])
    for t in range(6):
        tiles.append(gu[:, :, t * TILE:(t + 1) * TILE])
        scales.append(layers["gate_up_proj_s"][:, 0, t * TILE:(t + 1) * TILE])
    for t in range(3):
        tiles.append(down[:, t * TILE:(t + 1) * TILE, :])
        scales.append(layers["down_proj_s"][:, 0, :])

    return {
        "tiles": jnp.stack(tiles, axis=1),                     # (L, 15, 1024, 1024) int8
        "scales": jnp.stack(scales, axis=1).astype(jnp.float32),  # (L, 15, 1024)
        "in_ln": jnp.asarray(layers["input_layernorm"]),       # (L, H)
        "post_ln": jnp.asarray(layers["post_attention_layernorm"]),
        "q_norm": jnp.asarray(layers["q_norm"]),               # (L, D)
        "k_norm": jnp.asarray(layers["k_norm"]),
        "final_norm": jnp.asarray(final_norm).reshape(1, H),
    }


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (w.astype(jnp.float32) * normed).astype(x.dtype)


def _rope(x, cos, sin):
    """x: (B, h, D); cos/sin: (B, D) float32."""
    xf = x.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    half = D // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


def _microstep_kernel(x_ref, cos_ref, sin_ref, scales_ref, in_ln_ref,
                      post_ln_ref, qn_ref, kn_ref, fn_ref, idx_ref,
                      tiles_ref, kc_ref, vc_ref,
                      o_ref, kc_out, vc_out,
                      wbuf, kbuf, vbuf, wsem, kvisem, kvosem,
                      *, num_layers: int, eps: float):
    # Reads come from the input cache refs; each layer's full (updated) KV
    # block is written back to the output refs after the new slot is inserted
    # (cache blocks are ~100x smaller than the weight stream).
    idx = idx_ref[0, 0]
    b = x_ref.shape[0]
    scaling = D ** -0.5

    def wdma(i):
        l, t = divmod(i, NTILES)
        return pltpu.make_async_copy(tiles_ref.at[l, t], wbuf.at[i % 2],
                                     wsem.at[i % 2])

    def kv_in(l):
        return (pltpu.make_async_copy(kc_ref.at[l], kbuf, kvisem.at[0]),
                pltpu.make_async_copy(vc_ref.at[l], vbuf, kvisem.at[1]))

    def kv_out(l):
        return (pltpu.make_async_copy(kbuf, kc_out.at[l], kvosem.at[0]),
                pltpu.make_async_copy(vbuf, vc_out.at[l], kvosem.at[1]))

    total = num_layers * NTILES
    wdma(0).start()
    kin = kv_in(0)
    kin[0].start()
    kin[1].start()

    tile_i = 0

    def next_tile():
        nonlocal tile_i
        i = tile_i
        if i + 1 < total:
            wdma(i + 1).start()
        wdma(i).wait()
        tile_i += 1
        return wbuf[i % 2].astype(jnp.bfloat16)

    x = x_ref[:]  # (B, H) bf16

    for l in range(num_layers):
        h = _rms(x, in_ln_ref[l], eps)

        # ---- qkv (tiles 0-3) ----
        parts = []
        for t in range(4):
            w = next_tile()
            y = jnp.dot(h, w, preferred_element_type=jnp.float32)
            parts.append(y * scales_ref[l, t][None, :])
        q = jnp.concatenate(parts[0:2], axis=-1).reshape(b, NQ, D)
        k = parts[2].reshape(b, NKV, D)
        v = parts[3].reshape(b, NKV, D)

        q = _rms(q.astype(jnp.bfloat16), qn_ref[l], eps)
        k = _rms(k.astype(jnp.bfloat16), kn_ref[l], eps)
        cos = cos_ref[:].astype(jnp.float32)
        sin = sin_ref[:].astype(jnp.float32)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)

        # ---- KV cache insert + attention ----
        kin[0].wait()
        kin[1].wait()
        # insert the new position via a masked select (a dynamic vector store
        # at an arbitrary sublane offset is not supported by Mosaic)
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CACHE_S, 1), 2)
        kbuf[:] = jnp.where(slot == idx, k.astype(kbuf.dtype)[:, :, None, :],
                            kbuf[:])
        vbuf[:] = jnp.where(slot == idx, v.astype(vbuf.dtype)[:, :, None, :],
                            vbuf[:])
        ko = kv_out(l)
        ko[0].start()
        ko[1].start()

        # merge (B, NKV) into one batch dim — Mosaic matmul supports 1 batch dim
        g = NQ // NKV
        qf = (q.astype(jnp.float32) * scaling).reshape(b * NKV, g, D)
        kf = kbuf[:].astype(jnp.float32).reshape(b * NKV, CACHE_S, D)
        s = jax.lax.dot_general(
            qf, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (B*NKV, G, S)
        span = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CACHE_S), 2)
        s = jnp.where(span <= idx, s, -2.0 ** 30)
        p = jax.nn.softmax(s, axis=-1)
        vf = vbuf[:].astype(jnp.float32).reshape(b * NKV, CACHE_S, D)
        ctx = jax.lax.dot_general(
            p, vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (B*NKV, G, D)
        ctx = ctx.reshape(b, NQ, D)

        # ---- o_proj (tiles 4-5, accumulated over in-row chunks) ----
        acc = jnp.zeros((b, H), jnp.float32)
        for t in range(2):
            w = next_tile()
            x_t = ctx[:, t * 8:(t + 1) * 8, :].reshape(b, TILE).astype(jnp.bfloat16)
            acc = acc + jnp.dot(x_t, w, preferred_element_type=jnp.float32)
        attn_out = acc * scales_ref[l, 4][None, :]
        x = x + attn_out.astype(x.dtype)

        # ---- MLP (tiles 6-14) ----
        h2 = _rms(x, post_ln_ref[l], eps)
        gates = []
        for t in range(3):
            w = next_tile()
            y = jnp.dot(h2, w, preferred_element_type=jnp.float32)
            gates.append(y * scales_ref[l, 6 + t][None, :])
        acts = []
        for t in range(3):
            w = next_tile()
            u = jnp.dot(h2, w, preferred_element_type=jnp.float32)
            u = u * scales_ref[l, 9 + t][None, :]
            g = gates[t]
            acts.append((g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16))
        # prefetch next layer's KV while the down matmuls run
        if l + 1 < num_layers:
            ko_cur = kv_out(l)  # must complete before kbuf is overwritten
            ko_cur[0].wait()
            ko_cur[1].wait()
            kin = kv_in(l + 1)
            kin[0].start()
            kin[1].start()
        macc = jnp.zeros((b, H), jnp.float32)
        for t in range(3):
            w = next_tile()
            macc = macc + jnp.dot(acts[t], w, preferred_element_type=jnp.float32)
        mlp = macc * scales_ref[l, 12][None, :]
        x = x + mlp.astype(x.dtype)

    ko = kv_out(num_layers - 1)
    ko[0].wait()
    ko[1].wait()
    o_ref[:] = _rms(x, fn_ref[0], eps)


@functools.partial(jax.jit, static_argnames=("num_layers", "eps", "interpret"))
def fused_subtalker_microstep(packed: dict, x: jax.Array, cos: jax.Array,
                              sin: jax.Array, k_cache: jax.Array,
                              v_cache: jax.Array, index: jax.Array,
                              num_layers: int = 5, eps: float = 1e-6,
                              interpret: bool = False):
    """One code-predictor micro-forward through the fused kernel.

    x: (B, H) bf16 input embedding (post mtp projection);
    cos/sin: (B, D) RoPE tables for this position;
    k_cache/v_cache: (L, B, NKV, CACHE_S, D) bf16, donated and updated;
    index: scalar int32 write position.
    Returns (h (B, H), k_cache, v_cache).
    """
    b = x.shape[0]
    assert x.shape == (b, H)
    kv_shape = (num_layers, b, NKV, CACHE_S, D)
    assert k_cache.shape == kv_shape, (k_cache.shape, kv_shape)

    idx2d = jnp.full((1, 1), index, jnp.int32)

    kernel = functools.partial(_microstep_kernel, num_layers=num_layers, eps=eps)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)

    h, kc, vc = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, H), x.dtype),
            jax.ShapeDtypeStruct(kv_shape, k_cache.dtype),
            jax.ShapeDtypeStruct(kv_shape, v_cache.dtype),
        ],
        in_specs=[vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, smem,
                  any_, any_, any_],
        out_specs=[vmem, any_, any_],
        scratch_shapes=[
            pltpu.VMEM((2, TILE, TILE), jnp.int8),
            pltpu.VMEM((b, NKV, CACHE_S, D), k_cache.dtype),
            pltpu.VMEM((b, NKV, CACHE_S, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, cos, sin, packed["scales"], packed["in_ln"], packed["post_ln"],
      packed["q_norm"], packed["k_norm"], packed["final_norm"], idx2d,
      packed["tiles"], k_cache, v_cache)
    return h, kc, vc
