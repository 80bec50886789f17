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
    per-out-channel scales) as (1024,1024) tile DMAs with an NWBUF-deep
    async pipeline — no repacking, the same arrays serve the XLA prefill;
  - the KV cache (layout (L,B,S,NKV,D), shared with the XLA path) is staged
    per layer HBM->VMEM with double-buffered prefetch (layer l+1's blocks
    load during layer l's MLP); the new position's k/v are written back as
    one small DMA per layer — the full block is never written back;
  - attention is computed in f32 over the staged block with left-pad +
    causal-slot masking (matches `nn.transformer.cache_attention_mask` for
    q_len=1), GQA via a (B*NKV, G, S) batched matmul;
  - the epilogue streams the int8 codec_head tiles and emits f32 logits;
    sampling (repetition penalty over the seen-set, suppress band, top-k/p)
    stays at the XLA level where it is cheap (B x V work).

Geometry is parameterized and assert-checked: hidden/query/kv widths and the
MLP intermediate must be multiples of the 1024 tile edge — true for both
production talkers (1.7B: 2048h/6144i, 0.6B: 1024h/3072i, both 16q/8kv/d128,
reference configuration_qwen3_tts.py:259-451).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
NWBUF = 4            # weight-tile VMEM slots (NWBUF-1 DMAs in flight)
NEG = -2.0 ** 30


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
                 wbuf, kbuf, vbuf, knew, vnew,
                 wsem, ksem, vsem, osem,
                 *, num_layers: int, eps: float,
                 nq: int, nkv: int, d: int, inter: int, vocab: int):
    b, hidden = x_ref.shape
    s_max = kc_ref.shape[2]
    scaling = d ** -0.5
    idx = idx_ref[0, 0]

    hi = hidden // TILE                 # in-chunks for H-input matmuls
    qd, kvd = nq * d, nkv * d
    qo = (qd + 2 * kvd) // TILE         # qkv out-chunks
    oi = qd // TILE                     # o_proj in-chunks
    ho = hidden // TILE                 # H out-chunks
    go = 2 * inter // TILE              # gate_up out-chunks
    di = inter // TILE                  # down in-chunks
    vo = vocab // TILE                  # head out-chunks
    per_layer = hi * qo + oi * ho + hi * go + di * ho

    # static DMA schedule for the whole step: (array, layer, in, out)
    sched = []
    for l in range(num_layers):
        for o in range(qo):
            for i in range(hi):
                sched.append(("qkv", l, i, o))
        for o in range(ho):
            for i in range(oi):
                sched.append(("o", l, i, o))
        for o in range(go):
            for i in range(hi):
                sched.append(("gu", l, i, o))
        for o in range(ho):
            for i in range(di):
                sched.append(("down", l, i, o))
    for o in range(vo):
        for i in range(hi):
            sched.append(("head", 0, i, o))
    total = len(sched)
    arrays = {"qkv": qkv_q_ref, "o": o_q_ref, "gu": gu_q_ref,
              "down": down_q_ref, "head": head_q_ref}

    def wdma(i):
        kind, l, ii, oo = sched[i]
        ref = arrays[kind]
        if kind == "head":
            src = ref.at[pl.ds(ii * TILE, TILE), pl.ds(oo * TILE, TILE)]
        else:
            src = ref.at[l, pl.ds(ii * TILE, TILE), pl.ds(oo * TILE, TILE)]
        return pltpu.make_async_copy(src, wbuf.at[i % NWBUF], wsem.at[i % NWBUF])

    def kv_in(l):
        slot = l % 2
        return (pltpu.make_async_copy(kc_ref.at[l], kbuf.at[slot], ksem.at[slot]),
                pltpu.make_async_copy(vc_ref.at[l], vbuf.at[slot], vsem.at[slot]))

    for i in range(NWBUF - 1):
        wdma(i).start()
    k0 = kv_in(0)
    k0[0].start()
    k0[1].start()

    tile_i = 0

    def next_tile():
        nonlocal tile_i
        i = tile_i
        if i + NWBUF - 1 < total:
            wdma(i + NWBUF - 1).start()
        wdma(i).wait()
        tile_i += 1
        return wbuf[i % NWBUF].astype(jnp.bfloat16)

    def matmul(h_chunks, n_in, n_out, scale_row):
        """Accumulated tiled matmul: h_chunks (list of (B, TILE) bf16) @
        streamed tiles -> (B, n_out*TILE) f32, scaled per out column."""
        outs = []
        for o in range(n_out):
            acc = jnp.zeros((b, TILE), jnp.float32)
            for i in range(n_in):
                w = next_tile()
                acc = acc + jnp.dot(h_chunks[i], w,
                                    preferred_element_type=jnp.float32)
            outs.append(acc * scale_row[o * TILE:(o + 1) * TILE][None, :])
        return jnp.concatenate(outs, axis=-1)

    def chunks(h, n):
        return [h[:, i * TILE:(i + 1) * TILE] for i in range(n)]

    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)
    slot_b1s = jax.lax.broadcasted_iota(jnp.int32, (b, 1, s_max), 2)
    slot_bs1d = jax.lax.broadcasted_iota(jnp.int32, (1, s_max, 1, 1), 1)
    pad_ok = pad_ref[:] > 0                                     # (B, S)
    visible = (slot_b1s <= idx) & pad_ok[:, None, :]            # (B, 1, S)

    x = x_ref[:]  # (B, H) bf16
    g = nq // nkv

    for l in range(num_layers):
        h = _rms(x, in_ln_ref[l], eps)
        hcs = chunks(h, hi)

        qkv = matmul(hcs, hi, qo, qkv_s_ref[l].astype(jnp.float32))
        q = qkv[:, :qd].astype(jnp.bfloat16).reshape(b, nq, d)
        k = qkv[:, qd:qd + kvd].astype(jnp.bfloat16).reshape(b, nkv, d)
        v = qkv[:, qd + kvd:].astype(jnp.bfloat16).reshape(b, nkv, d)

        q = _rms(q, qn_ref[l], eps)
        k = _rms(k, kn_ref[l], eps)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)

        # stage in the cache block, insert the new position in VMEM
        kin = kv_in(l)
        kin[0].wait()
        kin[1].wait()
        kb = kbuf[l % 2]  # (B, S, NKV, D)
        vb = vbuf[l % 2]
        kfull = jnp.where(slot_bs1d == idx, k[:, None].astype(kb.dtype), kb)
        vfull = jnp.where(slot_bs1d == idx, v[:, None].astype(vb.dtype), vb)
        # write ONLY the new slot back to HBM (block read is S; write is 1)
        knew[:] = k[:, None].astype(knew.dtype)
        vnew[:] = v[:, None].astype(vnew.dtype)
        ko = (pltpu.make_async_copy(knew, kc_out.at[l, :, pl.ds(idx, 1)],
                                    osem.at[0]),
              pltpu.make_async_copy(vnew, vc_out.at[l, :, pl.ds(idx, 1)],
                                    osem.at[1]))
        ko[0].start()
        ko[1].start()

        # GQA attention in f32 over the staged block
        qf = (q.astype(jnp.float32) * scaling).reshape(b * nkv, g, d)
        kt = jnp.swapaxes(kfull.astype(jnp.float32), 1, 2)  # (B, NKV, S, D)
        s = jax.lax.dot_general(
            qf, kt.reshape(b * nkv, s_max, d), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (B*NKV, G, S)
        s = s.reshape(b, nkv, g, s_max)
        s = jnp.where(visible[:, :, None, :], s, NEG)
        s = s.reshape(b * nkv, g, s_max)
        p = jax.nn.softmax(s, axis=-1)
        vsafe = jnp.where((slot_bs1d <= idx), vfull, 0)
        vt = jnp.swapaxes(vsafe.astype(jnp.float32), 1, 2)
        ctx = jax.lax.dot_general(
            p, vt.reshape(b * nkv, s_max, d), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (B*NKV, G, D)
        ctx = ctx.reshape(b, qd).astype(jnp.bfloat16)

        attn = matmul(chunks(ctx, oi), oi, ho, o_s_ref[l].astype(jnp.float32))
        x = x + attn.astype(x.dtype)

        h2 = _rms(x, post_ln_ref[l], eps)
        h2cs = chunks(h2, hi)
        gu = matmul(h2cs, hi, go, gu_s_ref[l].astype(jnp.float32))
        gate = gu[:, :inter]
        up = gu[:, inter:]
        act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)

        # prefetch next layer's KV during the down matmuls; the slot writes
        # must complete before their source scratch is reused next layer
        ko[0].wait()
        ko[1].wait()
        if l + 1 < num_layers:
            kn_ = kv_in(l + 1)
            kn_[0].start()
            kn_[1].start()

        down = matmul(chunks(act, di), di, ho, down_s_ref[l].astype(jnp.float32))
        x = x + down.astype(x.dtype)

    last_h = _rms(x, fn_ref[0], eps)
    h_out_ref[:] = last_h
    lcs = chunks(last_h, hi)
    logits = matmul(lcs, hi, vo, head_s_ref[0].astype(jnp.float32))
    logits_ref[:] = logits


def _vmem_estimate(b: int, s_max: int, nkv: int, d: int, vocab: int,
                   hidden: int, inter: int) -> int:
    kv = 4 * b * s_max * nkv * d * 2          # k/v double buffers (bf16)
    bufs = NWBUF * TILE * TILE                # weight tiles (int8)
    act = (b * vocab * 4                      # logits
           + 6 * b * max(2 * inter, vocab) * 4   # matmul/attention temps
           + 4 * b * s_max * nkv * d * 4)     # f32 attention relayouts
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
        if dim % TILE:
            raise ValueError(
                f"fused talker step requires {name} % {TILE} == 0, got {dim}")

    idx2d = jnp.full((1, 1), index, jnp.int32)
    kernel = functools.partial(
        _step_kernel, num_layers=num_layers, eps=eps,
        nq=nq, nkv=nkv, d=d, inter=inter, vocab=vocab)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    limit = min(_vmem_estimate(b, s_max, nkv, d, vocab, hidden, inter),
                100 << 20)

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
            pltpu.VMEM((NWBUF, TILE, TILE), jnp.int8),
            pltpu.VMEM((2, b, s_max, nkv, d), k_cache.dtype),
            pltpu.VMEM((2, b, s_max, nkv, d), v_cache.dtype),
            pltpu.VMEM((b, 1, nkv, d), k_cache.dtype),
            pltpu.VMEM((b, 1, nkv, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((NWBUF,)),
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
