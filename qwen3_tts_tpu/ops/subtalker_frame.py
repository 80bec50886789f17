"""Single-dispatch Pallas TPU megakernel for the FULL per-frame sub-talker.

The reference samples 15 residual codebooks per audio frame with 15
sequential HF `generate` steps of a 5-layer mini decoder (reference
modeling_qwen3_tts.py:1670-1686, 1249-1312). `ops/subtalker_step.py` fuses
one micro-step; this kernel fuses the WHOLE frame — 16 micro-forwards,
15 lm_head projections, exact top-k + gumbel-argmax sampling, and the
per-codebook embedding gathers — into ONE pallas dispatch:

  - the int8 weight tile stream (75 MB per micro-forward) runs continuously
    across all 16 micro-forwards with double-buffered async copies, so no
    dispatch gaps or per-call DMA pipeline restarts remain;
  - the tiny KV cache (17 live positions) lives entirely in VMEM scratch
    for the whole frame — zero HBM round-trips;
  - lm_heads (int8) are prefetched one step ahead; the sampled token's
    embedding row arrives as an aligned EMB_WIN-row HBM window DMA (Mosaic
    requires tile-aligned sublane slices) with the exact row selected
    in VMEM by a masked reduction;
  - sampling inside the kernel reproduces the XLA pipeline exactly for the
    sub-talker's processor chain (temperature -> top-k -> categorical;
    reference HF order, see nn/sampling.py): the top-k threshold is found
    by a 40-step bisection on the row values (equivalent to masking with
    the k-th largest value, `nn.sampling.apply_top_k` semantics), and
    categorical sampling is the gumbel-argmax identity with the SAME
    gumbel draw `jax.random.categorical` would make — callers pass
    `jax.random.gumbel(sub, (b, vocab))` per step (zeros for greedy), so
    sampled tokens match the XLA path draw-for-draw.

Sampling supports temperature, top-k AND nucleus top-p fully in-kernel:
both thresholds (the k-th largest logit and the smallest nucleus-kept
logit) are found by value bisection — no sort needed — reproducing
`apply_top_k`/`apply_top_p` masking exactly on tie-free logits.

Batch: the KV scratch stays VMEM-resident for the whole frame at any
batch up to MAX_B=64 (~0.66 MB per batch row at 5L/8kv/32slots/d128);
the kernel always sets `CompilerParams(vmem_limit_bytes=...)` from a
computed buffer-size estimate (v5e has 128 MB physical VMEM — the
16 MB default is a scheduling default, not the hardware bound). This
covers the b=32 serving config in ONE dispatch per frame.

Restrictions (callers fall back to the per-micro-step kernel otherwise):
production predictor geometry (1024 hidden / 3072 inter / 16q/8kv / d128)
and batch <= MAX_B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .subtalker_step import CACHE_S, D, H, INTER, NKV, NQ, QD
from .tilestream import TileStream, plan_groups, plan_matrix

MAX_B = 64          # VMEM-resident KV bound (k+v: 2*L*B*NKV*CACHE_S*D bf16)
N_STEPS = 15        # residual codebooks (num_code_groups - 1)
N_POS = N_STEPS + 1  # micro-forwards per frame
NEG = -1e9          # matches nn.sampling.NEG_INF
EMB_WIN = 16        # aligned HBM window per embedding-row gather
_BISECT_ITERS = 40


def pack_frame_weights(params_cp: dict, vocab_size: int) -> dict:
    """Extra packing for the frame megakernel on top of
    `subtalker_step.pack_predictor_weights` ("packed"): the mtp projection,
    int8 lm_heads, and codebook embedding tables, vocab padded to the lane
    width."""
    vp = -(-vocab_size // 128) * 128
    hq = jnp.asarray(params_cp["lm_heads_q"])          # (15, Hcp, V) int8
    hs = jnp.asarray(params_cp["lm_heads_s"], jnp.float32)  # (15, 1, V)
    emb = jnp.asarray(params_cp["codec_embeddings"])   # (15, V, Ht) bf16/f32
    n, hcp, v = hq.shape
    assert n == N_STEPS and hcp == H and v == vocab_size
    assert emb.shape[0] == N_STEPS and emb.shape[1] == vocab_size
    pad = vp - vocab_size
    return {
        "mtp_w": jnp.asarray(params_cp["small_to_mtp"], jnp.bfloat16),
        "mtp_b": jnp.asarray(params_cp["small_to_mtp_b"], jnp.bfloat16)
                    .reshape(1, H),  # bias is over the cp hidden (H)
        "heads_q": jnp.pad(hq, ((0, 0), (0, 0), (0, pad))),
        "heads_s": jnp.pad(hs[:, 0, :], ((0, 0), (0, pad))),
        "embeds": jnp.pad(emb, ((0, 0), (0, pad), (0, 0)))
                     .astype(jnp.bfloat16),
    }


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (w.astype(jnp.float32) * normed).astype(x.dtype)


def _rope1(x, cos, sin):
    """x: (B, h, D); cos/sin: (D,) float32 for one position."""
    xf = x.astype(jnp.float32)
    c = cos[None, None, :]
    s = sin[None, None, :]
    half = D // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


def _frame_plan(num_layers: int) -> list:
    """Weight-DMA schedule: N_POS micro-forwards of the full stack, whole
    matrices (or ~4 MB slices) per tile from the fused+int8 cp layout."""
    sched = []
    for _pos in range(N_POS):
        for l in range(num_layers):
            plan_matrix(sched, "qkv", l, H, QD + 2 * NKV * D)
            plan_matrix(sched, "o", l, QD, H)
            plan_matrix(sched, "gu", l, H, 2 * INTER)
            plan_matrix(sched, "down", l, INTER, H)
    return sched


def _frame_kernel(past_ref, first_ref, cos_ref, sin_ref, gumbel_ref,
                  temp_ref, tk_ref, tp_ref,
                  in_ln_ref, post_ln_ref, qn_ref, kn_ref, fn_ref,
                  mtpw_ref, mtpb_ref, hs_ref,
                  qkv_s_ref, o_s_ref, gu_s_ref, down_s_ref,
                  qkv_q_ref, o_q_ref, gu_q_ref, down_q_ref, hq_ref, emb_ref,
                  codes_ref, esum_ref,
                  *scratch,
                  num_layers: int, eps: float, vocab: int, do_sample: bool):
    b, ht = past_ref.shape  # talker hidden width (mtp bridges ht -> H)
    vp = gumbel_ref.shape[2]
    scaling = D ** -0.5

    sched = _frame_plan(num_layers)
    shapes, slot_of, nxt, prime = plan_groups(sched)
    ns = len(shapes)
    hbuf, kscr, vscr, erow, hsem, esem = scratch[2 * ns:]
    arrays = {"qkv": qkv_q_ref, "o": o_q_ref, "gu": gu_q_ref,
              "down": down_q_ref}
    stream = TileStream(sched, shapes, slot_of, nxt, prime, arrays,
                        scratch[:ns], scratch[ns:2 * ns])

    def hdma(s):
        return pltpu.make_async_copy(hq_ref.at[s], hbuf.at[s % 2],
                                     hsem.at[s % 2])

    hdma(0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, vp), 1)
    valid = lane < vocab
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CACHE_S, 1), 2)
    span_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CACHE_S), 2)
    code_lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    row_iota2 = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    codes_vec = jnp.zeros((b, 128), jnp.int32)
    esum = jnp.zeros((b, ht), jnp.float32)
    xv = past_ref[:]  # (B, Ht) bf16

    for pos in range(N_POS):
        # ---- input projection (mtp) ----
        x = jnp.dot(xv, mtpw_ref[:], preferred_element_type=jnp.float32)
        x = (x + mtpb_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

        cos = cos_ref[pos].astype(jnp.float32)
        sin = sin_ref[pos].astype(jnp.float32)

        for l in range(num_layers):
            h = _rms(x, in_ln_ref[l], eps)

            kvd = NKV * D
            qkv = stream.matmul(b, h, H, QD + 2 * kvd,
                                qkv_s_ref[l].astype(jnp.float32))
            q = qkv[:, :QD].astype(jnp.bfloat16).reshape(b, NQ, D)
            k = qkv[:, QD:QD + kvd].astype(jnp.bfloat16).reshape(b, NKV, D)
            v = qkv[:, QD + kvd:].astype(jnp.bfloat16).reshape(b, NKV, D)

            q = _rms(q, qn_ref[l], eps)
            k = _rms(k, kn_ref[l], eps)
            q = _rope1(q, cos, sin)
            k = _rope1(k, cos, sin)

            # KV insert at slot `pos` (static) — VMEM-resident for the frame
            kscr[l] = jnp.where(slot_iota == pos,
                                k.astype(kscr.dtype)[:, :, None, :], kscr[l])
            vscr[l] = jnp.where(slot_iota == pos,
                                v.astype(vscr.dtype)[:, :, None, :], vscr[l])

            g = NQ // NKV
            qf = (q.astype(jnp.float32) * scaling).reshape(b * NKV, g, D)
            kf = kscr[l].astype(jnp.float32).reshape(b * NKV, CACHE_S, D)
            s = jax.lax.dot_general(
                qf, kf, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = jnp.where(span_iota <= pos, s, -2.0 ** 30)
            p = jax.nn.softmax(s, axis=-1)
            # zero out never-written cache slots: scratch is uninitialized and
            # 0-weight x garbage must not produce NaN in the value matmul
            vsafe = jnp.where(slot_iota <= pos, vscr[l], 0)
            vf = vsafe.astype(jnp.float32).reshape(b * NKV, CACHE_S, D)
            ctx = jax.lax.dot_general(
                p, vf, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).reshape(b, NQ, D)

            attn = stream.matmul(b, ctx.reshape(b, QD).astype(jnp.bfloat16),
                                 QD, H, o_s_ref[l].astype(jnp.float32))
            x = x + attn.astype(x.dtype)

            h2 = _rms(x, post_ln_ref[l], eps)
            gu = stream.matmul(b, h2, H, 2 * INTER,
                               gu_s_ref[l].astype(jnp.float32))
            gate = gu[:, :INTER]
            up = gu[:, INTER:]
            act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
            down = stream.matmul(b, act, INTER, H,
                                 down_s_ref[l].astype(jnp.float32))
            x = x + down.astype(x.dtype)

        last_h = _rms(x, fn_ref[0], eps)  # (B, H) bf16

        if pos == 0:
            xv = first_ref[:]
            continue

        step = pos - 1
        # ---- lm_head[step] (prefetched int8, double-buffered) ----
        if step + 1 < N_STEPS:
            hdma(step + 1).start()
        hdma(step).wait()
        hw = hbuf[step % 2].astype(jnp.bfloat16)  # (H, Vp)
        logits = jnp.dot(last_h, hw, preferred_element_type=jnp.float32)
        logits = logits * hs_ref[step][None, :]
        logits = jnp.where(valid, logits, NEG)

        # ---- processor chain (nn/sampling.py parity): per-ROW traced knobs
        # (B,1) so one compiled program serves heterogeneous requests in the
        # continuous batcher (r2 verdict weak #8). Rows with top_k<=0 / >=V
        # or top_p>=1 pass through, matching _process_logits_batched; for a
        # static SamplingConfig the wrapper broadcasts its values, which
        # reproduces the old static specialization draw-for-draw (the temp
        # division is exact for t==1, and masking by the bisected k-th /
        # nucleus threshold equals apply_top_k/apply_top_p on tie-free
        # logits).
        if do_sample:
            temp = temp_ref[:].astype(jnp.float32)           # (B, 1)
            logits = logits / jnp.where(temp <= 0.0, 1.0, temp)
            row_k = tk_ref[:]                                # (B, 1) int32
            k_active = (row_k > 0) & (row_k < vocab)
            # k-th-largest threshold by bisection on row values; the
            # final mask equals apply_top_k's `logits < kth -> NEG`
            vmasked = jnp.where(valid, logits, jnp.inf)
            lo = jnp.min(vmasked, axis=-1, keepdims=True)
            hi = jnp.max(jnp.where(valid, logits, -jnp.inf), axis=-1,
                         keepdims=True)

            def cnt_ge(t):
                return jnp.sum(((logits >= t) & valid).astype(jnp.int32),
                               axis=-1, keepdims=True)

            for _ in range(_BISECT_ITERS):
                mid = 0.5 * (lo + hi)
                ge = cnt_ge(mid) >= row_k
                lo = jnp.where(ge, mid, lo)
                hi = jnp.where(ge, hi, mid)
            kth = jnp.where(cnt_ge(hi) >= row_k, hi, lo)
            logits = jnp.where(k_active & (logits < kth), NEG, logits)

            # nucleus threshold by bisection: XLA's apply_top_p keeps
            # token i iff the prob mass strictly above it is < top_p,
            # then masks logits < (smallest kept logit) — the kept set
            # is the upper set {logits > lo*} where lo* is the largest
            # value whose strictly-above mass is still >= top_p
            row_p = tp_ref[:].astype(jnp.float32)            # (B, 1)
            p_active = (row_p > 0.0) & (row_p < 1.0)
            mx = jnp.max(jnp.where(valid, logits, -jnp.inf), axis=-1,
                         keepdims=True)
            ex = jnp.where(valid, jnp.exp(logits - mx), 0.0)
            probs = ex / jnp.sum(ex, axis=-1, keepdims=True)

            def tail_mass(t):
                return jnp.sum(jnp.where(logits > t, probs, 0.0),
                               axis=-1, keepdims=True)

            plo = jnp.min(jnp.where(valid, logits, jnp.inf), axis=-1,
                          keepdims=True) - 1.0
            phi = mx
            for _ in range(_BISECT_ITERS):
                mid = 0.5 * (plo + phi)
                below = tail_mass(mid) < row_p
                plo = jnp.where(below, plo, mid)
                phi = jnp.where(below, mid, phi)
            logits = jnp.where(p_active & (logits <= plo), NEG, logits)

        z = logits + gumbel_ref[step]
        m = jnp.max(z, axis=-1, keepdims=True)
        tok = jnp.min(jnp.where(z == m, lane, vp), axis=-1,
                      keepdims=True)  # (B, 1) first argmax
        codes_vec = jnp.where(code_lane == step, tok, codes_vec)

        # ---- embedding row gathers: Mosaic requires HBM sublane slices to
        # be tile-aligned, so DMA an aligned 16-row window containing the
        # sampled row per batch element and select the row in VMEM ----
        row_copies = []
        for bi in range(b):
            t_bi = jnp.sum(jnp.where(row_iota2 == bi, tok, 0))
            base = pl.multiple_of((t_bi // EMB_WIN) * EMB_WIN, EMB_WIN)
            c = pltpu.make_async_copy(
                emb_ref.at[step, pl.ds(base, EMB_WIN)], erow.at[bi],
                esem.at[bi])
            c.start()
            row_copies.append(c)
        for c in row_copies:
            c.wait()
        win = erow[:]  # (B, EMB_WIN, Ht) bf16
        rem = (tok % EMB_WIN)[:, :, None]                    # (B, 1, 1)
        sel = jax.lax.broadcasted_iota(jnp.int32, (b, EMB_WIN, 1), 1) == rem
        rows = jnp.sum(jnp.where(sel, win.astype(jnp.float32), 0.0), axis=1)
        esum = esum + rows
        xv = rows.astype(jnp.bfloat16)

    codes_ref[:] = codes_vec
    esum_ref[:] = esum.astype(esum_ref.dtype)


def _vmem_estimate(shapes, b: int, ht: int, vp: int, num_layers: int) -> int:
    """Upper-bound VMEM bytes for the kernel's scratch + VMEM-resident inputs
    (activations/sampling temporaries get a 50% + 8MB allowance)."""
    kv = 2 * num_layers * b * NKV * CACHE_S * D * 2
    bufs = (sum(2 * it * ot for it, ot in shapes)  # weight tiles (int8)
            + 2 * H * vp                 # lm_head double buffer (int8)
            + b * EMB_WIN * ht * 2)      # embedding-row windows (bf16)
    inputs = (N_STEPS * b * vp * 4       # gumbel (f32)
              + ht * H * 2               # mtp_w (bf16)
              + 4 * b * vp * 4)          # logits/probs temporaries (f32)
    est = kv + bufs + inputs
    return est + est // 2 + (8 << 20)


@functools.partial(jax.jit, static_argnames=(
    "num_layers", "eps", "vocab", "top_k", "top_p", "temperature",
    "do_sample", "interpret"))
def fused_subtalker_frame(layers: dict, frame_packed: dict,
                          past_hidden: jax.Array, first_embed: jax.Array,
                          cos: jax.Array, sin: jax.Array, gumbel: jax.Array,
                          num_layers: int = 5, eps: float = 1e-6,
                          vocab: int = 2048, top_k: int = 50,
                          top_p: float = 1.0,
                          temperature: float = 0.9, do_sample: bool = True,
                          row_sampling=None,
                          interpret: bool = False):
    """All 15 residual-codebook samples for one frame in one dispatch.

    layers: the cp stack in the fused+int8 layout (qkv_proj_q (L,1024,4096)
    int8 + scales etc — streamed directly, no repacking);
    past_hidden/first_embed: (B, H) bf16 — talker last hidden and the
    codebook-0 embedding; cos/sin: (N_POS, D) RoPE rows for positions
    0..15; gumbel: (N_STEPS, B, Vp) f32 — `jax.random.gumbel` draws
    matching `jax.random.categorical`'s (zeros for greedy).
    row_sampling: optional `nn.sampling.BatchedSampling` of per-row traced
    knobs (continuous batching); overrides top_k/top_p/temperature.
    Returns (codes (B, N_STEPS) int32, embed_sum (B, H) f32).
    """
    b, ht = past_hidden.shape
    assert b <= MAX_B, b
    vp = frame_packed["heads_q"].shape[2]
    assert gumbel.shape == (N_STEPS, b, vp), (gumbel.shape, vp)

    if row_sampling is not None:
        row_temp = row_sampling.temperature.reshape(b, 1).astype(jnp.float32)
        row_tk = row_sampling.top_k.reshape(b, 1).astype(jnp.int32)
        row_tp = row_sampling.top_p.reshape(b, 1).astype(jnp.float32)
    else:  # broadcast the static config (greedy handled by do_sample=False)
        row_temp = jnp.full((b, 1), temperature or 1.0, jnp.float32)
        row_tk = jnp.full((b, 1), top_k, jnp.int32)
        row_tp = jnp.full((b, 1), top_p, jnp.float32)

    kernel = functools.partial(
        _frame_kernel, num_layers=num_layers, eps=eps, vocab=vocab,
        do_sample=do_sample)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    shapes, _, _, _ = plan_groups(_frame_plan(num_layers))
    limit = min(max(_vmem_estimate(shapes, b, ht, vp, num_layers), 24 << 20),
                100 << 20)
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=limit)

    codes, esum = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, ht), jnp.float32),
        ],
        in_specs=[vmem] * 20 + [any_] * 6,
        out_specs=[vmem, vmem],
        scratch_shapes=[
            *[pltpu.VMEM((2, it, ot), jnp.int8) for it, ot in shapes],
            *[pltpu.SemaphoreType.DMA((2,)) for _ in shapes],
            pltpu.VMEM((2, H, vp), jnp.int8),
            pltpu.VMEM((num_layers, b, NKV, CACHE_S, D), jnp.bfloat16),
            pltpu.VMEM((num_layers, b, NKV, CACHE_S, D), jnp.bfloat16),
            pltpu.VMEM((b, EMB_WIN, ht), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((b,)),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(past_hidden, first_embed, cos, sin, gumbel, row_temp, row_tk, row_tp,
      layers["input_layernorm"], layers["post_attention_layernorm"],
      layers["q_norm"], layers["k_norm"],
      jnp.asarray(layers["norm"]).reshape(1, H),
      frame_packed["mtp_w"], frame_packed["mtp_b"], frame_packed["heads_s"],
      layers["qkv_proj_s"][:, 0, :], layers["o_proj_s"][:, 0, :],
      layers["gate_up_proj_s"][:, 0, :], layers["down_proj_s"][:, 0, :],
      layers["qkv_proj_q"], layers["o_proj_q"], layers["gate_up_proj_q"],
      layers["down_proj_q"],
      frame_packed["heads_q"], frame_packed["embeds"])
    return codes[:, :N_STEPS], esum
