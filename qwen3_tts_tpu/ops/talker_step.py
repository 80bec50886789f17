"""Fused Pallas TPU kernel: one full talker decode step in a single dispatch.

The talker runs one 20-28-layer forward per 12Hz audio frame (reference
modeling_qwen3_tts.py:1635-1744 drives it through HF GenerationMixin). At
decode shapes (B<=8, T=1) the step is HBM-bandwidth-bound: the whole int8
weight stream (~1.4 GB for the 1.7B stack + codec head) must cross HBM every
frame. The XLA int8 path measures ~1.9x over that floor (b=1: ~3.3 ms vs the
~1.8 ms stream floor on v5e) because dequantized weight materialization and
per-op scheduling break the DMA pipeline.

This kernel runs the ENTIRE step — all L layers (fused qkv/gate_up int8
matmuls, q/k RMSNorm, RoPE, cached GQA attention, SwiGLU MLP), the final
norm, and the int8 codec_head — as one Pallas program:

  - int8 weights stream directly from the fused+quantized parameter layout
    (qkv_proj_q (L,H,QO) / o_proj_q / gate_up_proj_q / down_proj_q int8 +
    per-out-channel scales) — no repacking, the same arrays serve the XLA
    prefill;
  - weight DMAs use LARGE adaptive tiles (~4 MB, whole matrices where they
    fit) with a double-buffered pipeline per tile shape. Tile size is the
    lever that puts the kernel at the DMA floor: with (1024,1024) tiles the
    per-tile issue/wait overhead (~2 us) exceeds the ~1.3 us DMA and the
    step becomes overhead-bound (measured: step time flat in cache length);
    at ~4 MB per tile the DMA (~5 us) hides all scalar work;
  - the KV cache (layout (L,B,S,NKV,D), shared with the XLA path) is staged
    per layer HBM->VMEM with double-buffered prefetch; the new position's
    k/v are written back as one small DMA per layer — the full block is
    never written back;
  - attention is computed in f32 over the staged block with left-pad +
    causal-slot masking (matches `nn.transformer.cache_attention_mask` for
    q_len=1), GQA via a (B*NKV, G, S) batched matmul;
  - the epilogue streams the int8 codec_head tiles and emits f32 logits;
    sampling (repetition penalty over the seen-set, suppress band, top-k/p)
    stays at the XLA level where it is cheap (B x V work).

Geometry is parameterized and assert-checked: hidden/query/kv widths, the
MLP intermediate, and the vocab must be multiples of 256 lanes-and-sublanes
tiling — true for both production talkers (1.7B: 2048h/6144i/5120v, 0.6B:
1024h/3072i/5120v, both 16q/8kv/d128, reference
configuration_qwen3_tts.py:259-451).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tilestream import TileStream, plan_groups, plan_matrix, tile_shape

KV_TILE_BYTES = 4 << 20    # per-batch-tile KV staging target
NEG = -2.0 ** 30


def _batch_tile(b: int, s_max: int, nkv: int, d: int) -> int:
    """Largest batch sub-tile whose staged KV block fits KV_TILE_BYTES —
    attention is batch-independent, so large serving batches stream their
    cache in sub-batches instead of staging (B,S,NKV,D) monolithically."""
    bt = b
    while bt > 1 and bt % 2 == 0 and bt * s_max * nkv * d * 2 > KV_TILE_BYTES:
        bt //= 2
    return bt


def _plan(num_layers, hidden, qd, kvd, inter, vocab):
    """Static DMA schedule in exact consumption order."""
    sched = []
    for l in range(num_layers):
        plan_matrix(sched, "qkv", l, hidden, qd + 2 * kvd)
        plan_matrix(sched, "o", l, qd, hidden)
        plan_matrix(sched, "gu", l, hidden, 2 * inter)
        plan_matrix(sched, "down", l, inter, hidden)
    plan_matrix(sched, "head", 0, hidden, vocab)
    return sched


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (w.astype(jnp.float32) * (xf * jax.lax.rsqrt(var + eps))).astype(x.dtype)


def _rope(x, cos, sin):
    """x: (B, h, D); cos/sin: (B, D) float32."""
    xf = x.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


def _step_kernel(x_ref, cos_ref, sin_ref, pad_ref, idx_ref,
                 in_ln_ref, post_ln_ref, qn_ref, kn_ref, fn_ref,
                 qkv_s_ref, o_s_ref, gu_s_ref, down_s_ref, head_s_ref,
                 qkv_q_ref, o_q_ref, gu_q_ref, down_q_ref, head_q_ref,
                 kc_ref, vc_ref,
                 h_out_ref, logits_ref, kc_out, vc_out,
                 *scratch,
                 num_layers: int, eps: float,
                 nq: int, nkv: int, d: int, inter: int, vocab: int):
    b, hidden = x_ref.shape
    s_max = kc_ref.shape[2]
    scaling = d ** -0.5
    idx = idx_ref[0, 0]
    qd, kvd = nq * d, nkv * d

    sched = _plan(num_layers, hidden, qd, kvd, inter, vocab)
    shapes, slot_of, nxt, prime = plan_groups(sched)
    ns = len(shapes)
    kbuf, vbuf, knew, vnew, ksem, vsem, osem = scratch[2 * ns:]
    arrays = {"qkv": qkv_q_ref, "o": o_q_ref, "gu": gu_q_ref,
              "down": down_q_ref, "head": head_q_ref}

    bt = _batch_tile(b, s_max, nkv, d)
    nbt = b // bt

    def kv_in(l, t):
        slot = (l * nbt + t) % 2
        return (pltpu.make_async_copy(kc_ref.at[l, pl.ds(t * bt, bt)],
                                      kbuf.at[slot], ksem.at[slot]),
                pltpu.make_async_copy(vc_ref.at[l, pl.ds(t * bt, bt)],
                                      vbuf.at[slot], vsem.at[slot]))

    def kv_start(l, t):
        pair = kv_in(l, t)
        pair[0].start()
        pair[1].start()

    stream = TileStream(sched, shapes, slot_of, nxt, prime, arrays,
                        scratch[:ns], scratch[ns:2 * ns],
                        layerless=("head",))
    kv_start(0, 0)

    def matmul(kind, h_full, in_w, out_w, scale_row):
        return stream.matmul(b, h_full, in_w, out_w, scale_row)

    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)
    slot_b1s = jax.lax.broadcasted_iota(jnp.int32, (b, 1, s_max), 2)
    slot_bs1d = jax.lax.broadcasted_iota(jnp.int32, (1, s_max, 1, 1), 1)
    pad_ok = pad_ref[:] > 0                                     # (B, S)
    visible = (slot_b1s <= idx) & pad_ok[:, None, :]            # (B, 1, S)

    x = x_ref[:]  # (B, H) bf16
    g_rep = nq // nkv

    for l in range(num_layers):
        h = _rms(x, in_ln_ref[l], eps)

        qkv = matmul("qkv", h, hidden, qd + 2 * kvd,
                     qkv_s_ref[l].astype(jnp.float32))
        q = qkv[:, :qd].astype(jnp.bfloat16).reshape(b, nq, d)
        k = qkv[:, qd:qd + kvd].astype(jnp.bfloat16).reshape(b, nkv, d)
        v = qkv[:, qd + kvd:].astype(jnp.bfloat16).reshape(b, nkv, d)

        q = _rms(q, qn_ref[l], eps)
        k = _rms(k, kn_ref[l], eps)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)

        # attention over the cache, streamed in batch sub-tiles whose staged
        # KV blocks fit VMEM (attention rows are batch-independent)
        ctxs = []
        writes = []
        for t in range(nbt):
            kin = kv_in(l, t)
            kin[0].wait()
            kin[1].wait()
            slot = (l * nbt + t) % 2
            kb = kbuf[slot]  # (bt, S, NKV, D)
            vb = vbuf[slot]
            kt_new = jax.lax.slice_in_dim(k, t * bt, (t + 1) * bt, axis=0)
            vt_new = jax.lax.slice_in_dim(v, t * bt, (t + 1) * bt, axis=0)
            kfull = jnp.where(slot_bs1d == idx,
                              kt_new[:, None].astype(kb.dtype), kb)
            vfull = jnp.where(slot_bs1d == idx,
                              vt_new[:, None].astype(vb.dtype), vb)
            # write ONLY the new slot back to HBM (read is S slots; write 1);
            # knew/vnew are reused per tile, so drain the previous write first
            if writes:
                writes[-1][0].wait()
                writes[-1][1].wait()
            knew[:] = kt_new[:, None].astype(knew.dtype)
            vnew[:] = vt_new[:, None].astype(vnew.dtype)
            ko = (pltpu.make_async_copy(
                      knew, kc_out.at[l, pl.ds(t * bt, bt), pl.ds(idx, 1)],
                      osem.at[0]),
                  pltpu.make_async_copy(
                      vnew, vc_out.at[l, pl.ds(t * bt, bt), pl.ds(idx, 1)],
                      osem.at[1]))
            ko[0].start()
            ko[1].start()
            writes.append(ko)
            # prefetch the next KV stage while this tile's attention runs
            if t + 1 < nbt:
                kv_start(l, t + 1)

            q_t = jax.lax.slice_in_dim(q, t * bt, (t + 1) * bt, axis=0)
            qf = (q_t.astype(jnp.float32) * scaling).reshape(bt * nkv, g_rep, d)
            ktr = jnp.swapaxes(kfull.astype(jnp.float32), 1, 2)
            s = jax.lax.dot_general(
                qf, ktr.reshape(bt * nkv, s_max, d),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (bt*NKV, G, S)
            s = s.reshape(bt, nkv, g_rep, s_max)
            vis_t = jnp.expand_dims(
                jax.lax.slice_in_dim(visible, t * bt, (t + 1) * bt, axis=0), 2)
            s = jnp.where(vis_t, s, NEG)
            s = s.reshape(bt * nkv, g_rep, s_max)
            p = jax.nn.softmax(s, axis=-1)
            vsafe = jnp.where((slot_bs1d <= idx), vfull, 0)
            vtr = jnp.swapaxes(vsafe.astype(jnp.float32), 1, 2)
            ctx_t = jax.lax.dot_general(
                p, vtr.reshape(bt * nkv, s_max, d),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (bt*NKV, G, D)
            ctxs.append(ctx_t.reshape(bt, qd).astype(jnp.bfloat16))
        ctx = jnp.concatenate(ctxs, axis=0) if nbt > 1 else ctxs[0]

        attn = matmul("o", ctx, qd, hidden, o_s_ref[l].astype(jnp.float32))
        x = x + attn.astype(x.dtype)

        h2 = _rms(x, post_ln_ref[l], eps)
        gu = matmul("gu", h2, hidden, 2 * inter,
                    gu_s_ref[l].astype(jnp.float32))
        gate = gu[:, :inter]
        up = gu[:, inter:]
        act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)

        # prefetch next layer's first KV stage during the down matmuls; the
        # slot writes must complete before their source scratch is reused
        writes[-1][0].wait()
        writes[-1][1].wait()
        if l + 1 < num_layers:
            kv_start(l + 1, 0)

        down = matmul("down", act, inter, hidden,
                      down_s_ref[l].astype(jnp.float32))
        x = x + down.astype(x.dtype)

    last_h = _rms(x, fn_ref[0], eps)
    h_out_ref[:] = last_h
    logits = matmul("head", last_h, hidden, vocab,
                    head_s_ref[0].astype(jnp.float32))
    logits_ref[:] = logits


def _vmem_estimate(shapes, b: int, bt: int, s_max: int, nkv: int, d: int,
                   vocab: int, hidden: int, inter: int) -> int:
    kv = 4 * bt * s_max * nkv * d * 2         # k/v double buffers (bf16)
    bufs = sum(2 * it * ot for it, ot in shapes)  # weight tiles (int8)
    act = (b * vocab * 4                      # logits
           + 6 * b * max(2 * inter, vocab) * 4   # matmul temporaries
           + 4 * bt * s_max * nkv * d * 4)    # f32 attention relayouts
    est = kv + bufs + act
    return est + est // 2 + (16 << 20)


@functools.partial(jax.jit, static_argnames=("num_layers", "eps", "interpret"),
                   donate_argnums=(11, 12))
def fused_talker_step(layers: dict, final_norm: jax.Array,
                      head_q: jax.Array, head_s: jax.Array,
                      x: jax.Array, cos: jax.Array, sin: jax.Array,
                      pad_mask: jax.Array, index: jax.Array,
                      num_layers: int, eps: float,
                      k_cache: jax.Array, v_cache: jax.Array,
                      interpret: bool = False):
    """One talker decode step through the fused kernel.

    layers: the fused+int8 stacked layout from `fuse_talker_params` +
    `quantize_talker_params` (qkv_proj_q (L,H,QO) int8, ... , *_s scales,
    norms); head_q/head_s: int8 codec head; x: (B, H) bf16 input embedding;
    cos/sin: (B, D) RoPE rows for this position; pad_mask: (B, S) slot
    validity; index: scalar int32 write slot; k_cache/v_cache:
    (L, B, S, NKV, D) bf16, donated and updated in place.
    Returns (last_h (B, H) bf16, logits (B, V) f32, k_cache, v_cache).
    """
    b, hidden = x.shape
    L, _, s_max, nkv, d = k_cache.shape
    assert L == num_layers
    qkv_q = layers["qkv_proj_q"]
    gu_q = layers["gate_up_proj_q"]
    o_q = layers["o_proj_q"]
    down_q = layers["down_proj_q"]
    qd = o_q.shape[1]
    nq = qd // d
    inter = down_q.shape[1]
    vocab = head_q.shape[1]
    for dim, name in ((hidden, "hidden"), (qd, "query width"),
                      (nkv * d, "kv width"), (inter, "intermediate"),
                      (vocab, "vocab")):
        if dim % 256:
            raise ValueError(
                f"fused talker step requires {name} % 256 == 0, got {dim}")

    idx2d = jnp.full((1, 1), index, jnp.int32)
    kernel = functools.partial(
        _step_kernel, num_layers=num_layers, eps=eps,
        nq=nq, nkv=nkv, d=d, inter=inter, vocab=vocab)

    sched = _plan(num_layers, hidden, qd, nkv * d, inter, vocab)
    shapes, _, _, _ = plan_groups(sched)
    wbuf_scratch = [pltpu.VMEM((2, it, ot), jnp.int8) for it, ot in shapes]
    wsem_scratch = [pltpu.SemaphoreType.DMA((2,)) for _ in shapes]
    bt = _batch_tile(b, s_max, nkv, d)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    limit = min(_vmem_estimate(shapes, b, bt, s_max, nkv, d, vocab, hidden,
                               inter), 100 << 20)

    last_h, logits, kc, vc = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), x.dtype),
            jax.ShapeDtypeStruct((b, vocab), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        in_specs=[vmem, vmem, vmem, vmem, smem,
                  vmem, vmem, vmem, vmem, vmem,
                  vmem, vmem, vmem, vmem, vmem,
                  any_, any_, any_, any_, any_,
                  any_, any_],
        out_specs=[vmem, vmem, any_, any_],
        input_output_aliases={20: 2, 21: 3},
        scratch_shapes=[
            *wbuf_scratch,
            *wsem_scratch,
            pltpu.VMEM((2, bt, s_max, nkv, d), k_cache.dtype),
            pltpu.VMEM((2, bt, s_max, nkv, d), v_cache.dtype),
            pltpu.VMEM((bt, 1, nkv, d), k_cache.dtype),
            pltpu.VMEM((bt, 1, nkv, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(x, cos, sin, pad_mask, idx2d,
      layers["input_layernorm"], layers["post_attention_layernorm"],
      layers["q_norm"], layers["k_norm"], final_norm.reshape(1, hidden),
      layers["qkv_proj_s"][:, 0, :], layers["o_proj_s"][:, 0, :],
      layers["gate_up_proj_s"][:, 0, :], layers["down_proj_s"][:, 0, :],
      head_s.reshape(1, vocab),
      qkv_q, o_q, gu_q, down_q, head_q,
      k_cache, v_cache)
    return last_h, logits, kc, vc
