"""Fused talker decode-step kernel, int4-weight (+ optional int8-KV) edition.

Same single-dispatch program as `ops/talker_step_loop.py` (all L layers +
codec head of one decode step, layer-pair `fori_loop`, staged-KV attention —
reference runtime it replaces: modeling_qwen3_tts.py:1635-1744), with the
weight stream swapped from int8 to the group-wise int4 container and the KV
cache optionally int8 (r3 verdict next-round #3 and #6):

  - weights stream PACKED: uint8 tiles of the half-split nibble container
    (`nn.transformer._pack4`: packed row i = W[i] low nibble, W[half+i]
    high nibble). The b=1 step is weight-read bound (int8: 5.0 ms measured
    vs a ~4.9 ms 1.7 GB stream at the ~350 GB/s ACHIEVABLE bandwidth,
    NOTES.md r4 finding #2); halving the stream to 0.85 GB puts the floor
    at ~2.4 ms. The unpack (mask/shift -> bf16 -> group-scale multiply)
    is VPU work overlapped with the next tile's DMA.
  - XLA cannot exploit int4 on this path: the measured decode step with the
    fused-dequant XLA formulation is 30.9 ms (adjacent container) / still
    above int8 with the half-split one, because the dequant chain runs
    ~0.17 ms per 12.5 MB packed tile against int8's 0.13 (r4
    examples/bench_int4_matmul.py) — only explicit DMA pipelining wins.
  - group scales are small (1/64 of the packed bytes) and live VMEM-resident
    for the whole step as (L, G, OUT) tables, dynamically indexed on the
    OUTER dim per layer (alignment-safe, unlike the 2D sublane-dynamic case
    that forced the masked-reduction `row()` trick in the int8 kernel).
  - optional int8 KV: per-slot scales are staged next to the cache tiles and
    folded into the attention dots exactly like `nn.attention.
    gqa_attention_quant`; the new slot is quantized in-kernel with
    `nn.cache.quantize_kv` semantics (f32 scale for the divide, bf16 scale
    stored) so later XLA steps read identical values.

Geometry requirements: every matmul dim % 256 == 0 (both production
talkers), plus each packed tile's row count divisible by — or dividing —
the scale-group row count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .talker_step import NEG, _batch_tile, _rms, _rope
from .talker_step_loop import _PairStream
from .tilestream import plan_groups, plan_matrix, tile_shape


def _pair_plan_q4(hidden, qd, kvd, inter):
    """Packed-weight tile schedule for one layer pair, consumption order.
    in_w is the PACKED row count (half the logical contraction dim)."""
    sched = []
    for rel in (0, 1):
        plan_matrix(sched, "qkv", rel, hidden // 2, qd + 2 * kvd)
        plan_matrix(sched, "o", rel, qd // 2, hidden)
        plan_matrix(sched, "gu", rel, hidden // 2, 2 * inter)
        plan_matrix(sched, "down", rel, inter // 2, hidden)
    return sched


class _PairStreamQ4(_PairStream):
    """_PairStream whose consumer takes the RAW uint8 tile (no astype)."""

    def next_raw(self, l0, l0_next):
        i = self.cursor
        self.cursor = (self.cursor + 1) % len(self.sched)
        if self.nxt[i] is not None:
            self._dma(self.nxt[i], l0).start()
        else:
            g = self.slot_of[i][0]
            self._dma(self.prime[g], l0_next).start()
        self._dma(i, l0).wait()
        g, slot = self.slot_of[i]
        return self.wbufs[g][slot]


def _lrow(ref, l_arr):
    """Layer slice of a VMEM-resident (L, A, B) table by TRACED layer index.
    Dynamic indexing is alignment-safe here because the index is on the
    OUTER dim (whole (A, B) tile planes) — unlike the 2D (L, W) tables of
    the int8 kernel, whose dynamic sublane index forced a masked-reduction
    workaround (ops/talker_step_loop.py `row()`)."""
    return ref[pl.ds(l_arr, 1)][0]


def _group_sums(h_full, kg):
    """(b, in_w) -> (b, in_w//kg) f32 sums of kg-wide lane chunks (for the
    lo-nibble +8 bias correction). The lane-split reshape is Mosaic-legal
    (probed r4)."""
    b, in_w = h_full.shape
    return h_full.astype(jnp.float32).reshape(b, in_w // kg, kg).sum(-1)


def _matmul_q4(stream, b, h_full, in_w, out_w, s_plane, l0, l0_next):
    """(b, in_w) @ int4-packed (in_w, out_w) -> (b, out_w) f32.

    Dequant strategy (3rd formulation; the measured winner): the MXU
    consumes the RAW nibble planes and the scales hit the accumulator —
    per 128-row group g, acc += (h_g @ lo_bits_g - 8*sum(h_g)) * s_g
    + (h_g' @ hi_units_g) * (s_g'/16), where lo_bits = (t & 0xF) is the
    biased low nibble and hi_units = t_bf16 - lo_bits = 16*value of the
    SIGNED high nibble. Elementwise work is 4 ops per packed byte (2 per
    weight value); the first formulation (expand scales onto (it, ot) and
    pre-multiply the weights) spent ~9 ops/byte and measured SLOWER than
    the int8 kernel (5.78 vs 5.00 ms at b=1) despite half the DMA.
    Mosaic constraints honored: no uint8 casts, no int8 shifts, no int8
    subtract (all bit-extraction in `&` + bf16 arithmetic)."""
    half = in_w // 2
    grows = in_w // s_plane.shape[0]       # contraction rows per scale group
    it, ot = tile_shape(half, out_w)
    kg = min(grows, it)
    hg = _group_sums(h_full, kg)           # (b, in_w//kg) f32
    outs = []
    for o0 in range(0, out_w, ot):
        acc = jnp.zeros((b, ot), jnp.float32)
        for i0 in range(0, half, it):
            tile = stream.next_raw(l0, l0_next)       # (it, ot) i8 bitcast
            lo_bits = (tile & jnp.int8(0x0F)).astype(jnp.bfloat16)
            hi_units = tile.astype(jnp.bfloat16) - lo_bits   # 16 * value
            for j in range(it // kg):
                r0 = j * kg
                g_lo = (i0 + r0) // kg
                s_lo = s_plane[(i0 + r0) // grows:(i0 + r0) // grows + 1,
                               o0:o0 + ot].astype(jnp.float32)
                s_hi = s_plane[(half + i0 + r0) // grows:
                               (half + i0 + r0) // grows + 1,
                               o0:o0 + ot].astype(jnp.float32)
                d_lo = jnp.dot(h_full[:, i0 + r0:i0 + r0 + kg],
                               lo_bits[r0:r0 + kg],
                               preferred_element_type=jnp.float32)
                d_hi = jnp.dot(h_full[:, half + i0 + r0:half + i0 + r0 + kg],
                               hi_units[r0:r0 + kg],
                               preferred_element_type=jnp.float32)
                acc = (acc + (d_lo - 8.0 * hg[:, g_lo:g_lo + 1]) * s_lo
                       + d_hi * (s_hi * 0.0625))
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def _q4_kernel(x_ref, cos_ref, sin_ref, pad_ref, idx_ref,
               in_ln_ref, post_ln_ref, qn_ref, kn_ref, fn_ref,
               qkv_s_ref, o_s_ref, gu_s_ref, down_s_ref, head_s_ref,
               qkv_q_ref, o_q_ref, gu_q_ref, down_q_ref, head_q_ref,
               *refs,
               num_layers: int, eps: float, nq: int, nkv: int, d: int,
               inter: int, vocab: int, kv_quant: bool):
    b, hidden = x_ref.shape
    if kv_quant:
        (kc_ref, vc_ref, ks_ref, vs_ref,
         h_out_ref, logits_ref, kc_out, vc_out, ks_out, vs_out,
         *scratch) = refs
    else:
        (kc_ref, vc_ref,
         h_out_ref, logits_ref, kc_out, vc_out, *scratch) = refs
        ks_ref = vs_ref = ks_out = vs_out = None
    s_max = kc_ref.shape[2]
    scaling = d ** -0.5
    idx = idx_ref[0, 0]
    qd, kvd = nq * d, nkv * d

    sched = _pair_plan_q4(hidden, qd, kvd, inter)
    shapes, slot_of, nxt, prime = plan_groups(sched)
    ns = len(shapes)
    cur = 2 * ns
    hbuf, hsem = scratch[cur:cur + 2]
    cur += 2
    kbuf, vbuf, knew, vnew, ksem, vsem, osem = scratch[cur:cur + 7]
    arrays = {"qkv": qkv_q_ref, "o": o_q_ref, "gu": gu_q_ref,
              "down": down_q_ref}

    bt = _batch_tile(b, s_max, nkv, d)
    nbt = b // bt

    def kv_in(l_arr, rel, t):
        # the int8 cache VALUES stream via DMA (lane dim D=128, aligned);
        # the per-slot SCALES are (L,B,S,NKV) with NKV=8 lanes — a DMA
        # slice of that violates Mosaic's 128-lane slice alignment (r4
        # compile error), so the scale arrays are VMEM-RESIDENT inputs
        # (~14.6 MB each at b=8, S=4096; counted in _vmem_estimate_q4)
        # read/written per layer by outer-dim index.
        slot = (rel * nbt + t) % 2
        return [pltpu.make_async_copy(kc_ref.at[l_arr, pl.ds(t * bt, bt)],
                                      kbuf.at[slot], ksem.at[slot]),
                pltpu.make_async_copy(vc_ref.at[l_arr, pl.ds(t * bt, bt)],
                                      vbuf.at[slot], vsem.at[slot])]

    def kv_start(l_arr, rel, t):
        for c in kv_in(l_arr, rel, t):
            c.start()

    def kv_wait(l_arr, rel, t):
        for c in kv_in(l_arr, rel, t):
            c.wait()

    stream = _PairStreamQ4(sched, shapes, slot_of, nxt, prime, arrays,
                           scratch[:ns], scratch[ns:2 * ns])
    stream.prime_all(jnp.int32(0))
    kv_start(jnp.int32(0), 0, 0)

    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)
    slot_b1s = jax.lax.broadcasted_iota(jnp.int32, (b, 1, s_max), 2)
    slot_bs1d = jax.lax.broadcasted_iota(jnp.int32, (1, s_max, 1, 1), 1)
    slot_1s1 = jax.lax.broadcasted_iota(jnp.int32, (1, s_max, 1), 1)
    pad_ok = pad_ref[:] > 0                                     # (B, S)
    visible = (slot_b1s <= idx) & pad_ok[:, None, :]            # (B, 1, S)
    g_rep = nq // nkv
    last_pair = jnp.int32(num_layers - 2)

    def one_layer(x, l0, l0_next, rel):
        l_arr = l0 + rel
        h = _rms(x, _lrow(in_ln_ref, l_arr), eps)

        qkv = _matmul_q4(stream, b, h, hidden, qd + 2 * kvd,
                         _lrow(qkv_s_ref, l_arr), l0, l0_next)
        q = qkv[:, :qd].astype(jnp.bfloat16).reshape(b, nq, d)
        k = qkv[:, qd:qd + kvd].astype(jnp.bfloat16).reshape(b, nkv, d)
        v = qkv[:, qd + kvd:].astype(jnp.bfloat16).reshape(b, nkv, d)

        q = _rms(q, _lrow(qn_ref, l_arr), eps)
        k = _rms(k, _lrow(kn_ref, l_arr), eps)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)

        if kv_quant:
            # quantize the whole batch's new slot once per layer with
            # nn.cache.quantize_kv semantics (divide by the f32 scale,
            # store the bf16-rounded scale), update the layer's VMEM
            # scale planes in place, and write them back whole (tiny)
            def quant(xt):
                xf = xt.astype(jnp.float32)                # (B, NKV, D)
                sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1),
                                 1e-8) / 127.0             # (B, NKV) f32
                qv = jnp.clip(jnp.round(xf / sc[..., None]),
                              -127, 127).astype(jnp.int8)
                return qv, sc.astype(jnp.bfloat16)
            k_qn_all, k_sc = quant(k)
            v_qn_all, v_sc = quant(v)
            ks_upd = jnp.where(slot_1s1 == idx, k_sc[:, None],
                               ks_ref[pl.ds(l_arr, 1)][0])  # (B, S, NKV)
            vs_upd = jnp.where(slot_1s1 == idx, v_sc[:, None],
                               vs_ref[pl.ds(l_arr, 1)][0])
            ks_out[pl.ds(l_arr, 1)] = ks_upd[None]
            vs_out[pl.ds(l_arr, 1)] = vs_upd[None]
        else:
            k_qn_all = k
            v_qn_all = v

        ctxs = []
        writes = []
        for t in range(nbt):
            kv_wait(l_arr, rel, t)
            slot = (rel * nbt + t) % 2
            kb = kbuf[slot]  # (bt, S, NKV, D) cache dtype
            vb = vbuf[slot]
            k_qn = jax.lax.slice_in_dim(k_qn_all, t * bt, (t + 1) * bt,
                                        axis=0).astype(kb.dtype)
            v_qn = jax.lax.slice_in_dim(v_qn_all, t * bt, (t + 1) * bt,
                                        axis=0).astype(vb.dtype)
            kfull = jnp.where(slot_bs1d == idx, k_qn[:, None], kb)
            vfull = jnp.where(slot_bs1d == idx, v_qn[:, None], vb)
            if kv_quant:
                ksfull = jax.lax.slice_in_dim(ks_upd, t * bt, (t + 1) * bt,
                                              axis=0)      # (bt, S, NKV)
                vsfull = jax.lax.slice_in_dim(vs_upd, t * bt, (t + 1) * bt,
                                              axis=0)

            if writes:
                for w in writes[-1]:
                    w.wait()
            knew[:] = k_qn[:, None]
            vnew[:] = v_qn[:, None]
            ko = [pltpu.make_async_copy(
                      knew, kc_out.at[l_arr, pl.ds(t * bt, bt), pl.ds(idx, 1)],
                      osem.at[0]),
                  pltpu.make_async_copy(
                      vnew, vc_out.at[l_arr, pl.ds(t * bt, bt), pl.ds(idx, 1)],
                      osem.at[1])]
            for w in ko:
                w.start()
            writes.append(ko)
            if t + 1 < nbt:
                kv_start(l_arr, rel, t + 1)

            q_t = jax.lax.slice_in_dim(q, t * bt, (t + 1) * bt, axis=0)
            qf = (q_t.astype(jnp.float32) * scaling).reshape(bt * nkv, g_rep, d)
            ktr = jnp.swapaxes(kfull.astype(jnp.float32), 1, 2)
            s = jax.lax.dot_general(
                qf, ktr.reshape(bt * nkv, s_max, d),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (bt*NKV, G, S)
            if kv_quant:
                ks_t = jnp.swapaxes(ksfull, 1, 2).astype(
                    jnp.float32).reshape(bt * nkv, 1, s_max)
                s = s * ks_t
            s = s.reshape(bt, nkv, g_rep, s_max)
            vis_t = jnp.expand_dims(
                jax.lax.slice_in_dim(visible, t * bt, (t + 1) * bt, axis=0), 2)
            s = jnp.where(vis_t, s, NEG)
            s = s.reshape(bt * nkv, g_rep, s_max)
            p = jax.nn.softmax(s, axis=-1)
            if kv_quant:
                vs_t = jnp.swapaxes(vsfull, 1, 2).astype(
                    jnp.float32).reshape(bt * nkv, 1, s_max)
                p = p * vs_t
            vsafe = jnp.where((slot_bs1d <= idx), vfull, 0)
            vtr = jnp.swapaxes(vsafe.astype(jnp.float32), 1, 2)
            ctx_t = jax.lax.dot_general(
                p, vtr.reshape(bt * nkv, s_max, d),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (bt*NKV, G, D)
            ctxs.append(ctx_t.reshape(bt, qd).astype(jnp.bfloat16))
        ctx = jnp.concatenate(ctxs, axis=0) if nbt > 1 else ctxs[0]

        attn = _matmul_q4(stream, b, ctx, qd, hidden,
                          _lrow(o_s_ref, l_arr), l0, l0_next)
        x = x + attn.astype(x.dtype)

        h2 = _rms(x, _lrow(post_ln_ref, l_arr), eps)
        gu = _matmul_q4(stream, b, h2, hidden, 2 * inter,
                        _lrow(gu_s_ref, l_arr), l0, l0_next)
        gate = gu[:, :inter]
        up = gu[:, inter:]
        act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)

        for w in writes[-1]:
            w.wait()
        if rel == 0:
            kv_start(l0 + 1, 1, 0)
        else:
            kv_start(l0_next, 0, 0)

        down = _matmul_q4(stream, b, act, inter, hidden,
                          _lrow(down_s_ref, l_arr), l0, l0_next)
        return x + down.astype(x.dtype)

    def pair_body(i, x):
        l0 = (2 * i).astype(jnp.int32)
        l0_next = jnp.minimum(l0 + 2, last_pair)
        x = one_layer(x, l0, l0_next, 0)
        x = one_layer(x, l0, l0_next, 1)
        return x

    x = jax.lax.fori_loop(0, num_layers // 2, pair_body, x_ref[:],
                          unroll=False)

    stream.drain_all(last_pair)
    kv_wait(last_pair, 0, 0)

    last_h = _rms(x, fn_ref[:], eps)
    h_out_ref[:] = last_h

    # codec head: packed tiles through a dedicated double buffer (same
    # raw-bits + accumulator-scale formulation as _matmul_q4)
    half_h = hidden // 2
    grows_h = hidden // head_s_ref.shape[0]
    it, ot = tile_shape(half_h, vocab)
    kg_h = min(grows_h, it)
    hg_h = _group_sums(last_h, kg_h)
    tiles = [(o0, i0) for o0 in range(0, vocab, ot)
             for i0 in range(0, half_h, it)]

    def head_dma(j, slot):
        o0, i0 = tiles[j]
        return pltpu.make_async_copy(
            head_q_ref.at[pl.ds(i0, it), pl.ds(o0, ot)],
            hbuf.at[slot], hsem.at[slot])

    head_dma(0, 0).start()
    outs = []
    acc = jnp.zeros((b, ot), jnp.float32)
    for j, (o0, i0) in enumerate(tiles):
        if j + 1 < len(tiles):
            head_dma(j + 1, (j + 1) % 2).start()
        head_dma(j, j % 2).wait()
        tile = hbuf[j % 2]                            # (it, ot) i8 bitcast
        lo_bits = (tile & jnp.int8(0x0F)).astype(jnp.bfloat16)
        hi_units = tile.astype(jnp.bfloat16) - lo_bits
        for jj in range(it // kg_h):
            r0 = jj * kg_h
            g_lo = (i0 + r0) // kg_h
            s_lo = head_s_ref[(i0 + r0) // grows_h:(i0 + r0) // grows_h + 1,
                              o0:o0 + ot].astype(jnp.float32)
            s_hi = head_s_ref[(half_h + i0 + r0) // grows_h:
                              (half_h + i0 + r0) // grows_h + 1,
                              o0:o0 + ot].astype(jnp.float32)
            d_lo = jnp.dot(last_h[:, i0 + r0:i0 + r0 + kg_h],
                           lo_bits[r0:r0 + kg_h],
                           preferred_element_type=jnp.float32)
            d_hi = jnp.dot(last_h[:, half_h + i0 + r0:half_h + i0 + r0 + kg_h],
                           hi_units[r0:r0 + kg_h],
                           preferred_element_type=jnp.float32)
            acc = (acc + (d_lo - 8.0 * hg_h[:, g_lo:g_lo + 1]) * s_lo
                   + d_hi * (s_hi * 0.0625))
        if i0 + it >= half_h:
            outs.append(acc)
            acc = jnp.zeros((b, ot), jnp.float32)
    logits_ref[:] = (jnp.concatenate(outs, axis=-1)
                     if len(outs) > 1 else outs[0])


def _vmem_estimate_q4(shapes, head_shape, b, bt, s_max, nkv, d, vocab,
                      hidden, inter, num_layers, scale_bytes, kv_bytes):
    kv = 4 * bt * s_max * nkv * d * kv_bytes
    bufs = sum(2 * it * ot for it, ot in shapes) + 2 * head_shape[0] * head_shape[1]
    act = (b * vocab * 4
           + 8 * b * max(2 * inter, vocab) * 4
           + 4 * bt * s_max * nkv * d * 4)
    est = kv + bufs + act + scale_bytes
    return est + est // 2 + (16 << 20)


@functools.partial(jax.jit,
                   static_argnames=("num_layers", "eps", "interpret"),
                   donate_argnums=(11, 12, 13, 14))
def fused_talker_step_q4(layers: dict, final_norm: jax.Array,
                         head_q4: jax.Array, head_s4: jax.Array,
                         x: jax.Array, cos: jax.Array, sin: jax.Array,
                         pad_mask: jax.Array, index: jax.Array,
                         num_layers: int, eps: float,
                         k_cache: jax.Array, v_cache: jax.Array,
                         k_scale: jax.Array | None = None,
                         v_scale: jax.Array | None = None,
                         interpret: bool = False):
    """One talker decode step through the int4-weight fused kernel.

    layers: the fused + group-int4 stacked layout from `fuse_talker_params`
    + `quantize_talker_params_int4` (qkv_proj_q4 (L, H//2, QO) uint8
    half-split packed, *_s4 (L, G, out) bf16 group scales, norms);
    head_q4/head_s4: packed codec head. k_cache/v_cache: (L, B, S, NKV, D),
    bf16 — or int8 with k_scale/v_scale (L, B, S, NKV) bf16 — all donated
    and updated in place. Returns (last_h, logits, k, v[, ks, vs])."""
    b, hidden = x.shape
    L, _, s_max, nkv, d = k_cache.shape
    assert L == num_layers and num_layers % 2 == 0
    kv_quant = k_cache.dtype == jnp.int8
    assert (k_scale is not None) == kv_quant

    def _i8(a):  # Mosaic-compatible view of the packed uint8 container
        return jax.lax.bitcast_convert_type(a, jnp.int8)

    qkv_q = _i8(layers["qkv_proj_q4"])
    o_q = _i8(layers["o_proj_q4"])
    gu_q = _i8(layers["gate_up_proj_q4"])
    down_q = _i8(layers["down_proj_q4"])
    head_q4 = _i8(head_q4)
    qd = o_q.shape[1] * 2             # o packed rows = qd // 2
    nq = qd // d
    inter = down_q.shape[1] * 2       # down packed rows = inter // 2
    vocab = head_q4.shape[1]
    for dim, name in ((hidden, "hidden"), (qd, "query width"),
                      (nkv * d, "kv width"), (inter, "intermediate"),
                      (vocab, "vocab")):
        if dim % 256:
            raise ValueError(
                f"fused q4 talker step requires {name} % 256 == 0, got {dim}")
    # scale-group geometry: each packed tile must divide into (or fit
    # inside) whole groups for the static per-group dot plan
    for s_arr, in_w, out_w in ((layers["qkv_proj_s4"], hidden, qd + 2 * nkv * d),
                               (layers["o_proj_s4"], qd, hidden),
                               (layers["gate_up_proj_s4"], hidden, 2 * inter),
                               (layers["down_proj_s4"], inter, hidden),
                               (head_s4.reshape(head_s4.shape[-2], vocab),
                                hidden, vocab)):
        grows = in_w // s_arr.shape[-2]
        it, _ = tile_shape(in_w // 2, out_w)
        if not (it % grows == 0 or grows % it == 0):
            raise ValueError(f"int4 scale groups ({grows} rows) misaligned "
                             f"with packed tile rows ({it})")

    idx2d = jnp.full((1, 1), index, jnp.int32)
    kernel = functools.partial(
        _q4_kernel, num_layers=num_layers, eps=eps,
        nq=nq, nkv=nkv, d=d, inter=inter, vocab=vocab, kv_quant=kv_quant)

    sched = _pair_plan_q4(hidden, qd, nkv * d, inter)
    shapes, _, _, _ = plan_groups(sched)
    wbuf_scratch = [pltpu.VMEM((2, it, ot), jnp.int8) for it, ot in shapes]
    wsem_scratch = [pltpu.SemaphoreType.DMA((2,)) for _ in shapes]
    h_it, h_ot = tile_shape(hidden // 2, vocab)
    bt = _batch_tile(b, s_max, nkv, d)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)

    scale_bytes = 2 * sum(
        int(layers[n].size) for n in ("qkv_proj_s4", "o_proj_s4",
                                      "gate_up_proj_s4", "down_proj_s4"))
    if kv_quant:
        # the per-slot KV scale planes are VMEM-RESIDENT inputs+outputs
        # (k/v x in/out, (L,B,S,NKV) bf16 each — ~14.6 MB apiece at b=8,
        # S=4096): count them or the limit is underestimated at the top of
        # the advertised gate and Mosaic compile fails (advisor r4)
        scale_bytes += 4 * int(k_scale.size) * 2
    kv_bytes = 1 if kv_quant else 2
    limit = min(_vmem_estimate_q4(shapes, (h_it, h_ot), b, bt, s_max, nkv, d,
                                  vocab, hidden, inter, num_layers,
                                  scale_bytes, kv_bytes), 110 << 20)

    out_shape = [
        jax.ShapeDtypeStruct((b, hidden), x.dtype),
        jax.ShapeDtypeStruct((b, vocab), jnp.float32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    in_specs = [vmem, vmem, vmem, vmem, smem,
                vmem, vmem, vmem, vmem, vmem,
                vmem, vmem, vmem, vmem, vmem,
                any_, any_, any_, any_, any_,
                any_, any_]
    out_specs = [vmem, vmem, any_, any_]
    aliases = {20: 2, 21: 3}
    scratch = [
        *wbuf_scratch,
        *wsem_scratch,
        pltpu.VMEM((2, h_it, h_ot), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((2, bt, s_max, nkv, d), k_cache.dtype),
        pltpu.VMEM((2, bt, s_max, nkv, d), v_cache.dtype),
        pltpu.VMEM((bt, 1, nkv, d), k_cache.dtype),
        pltpu.VMEM((bt, 1, nkv, d), v_cache.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    operands = [x, cos, sin, pad_mask, idx2d,
                layers["input_layernorm"].reshape(L, 1, hidden),
                layers["post_attention_layernorm"].reshape(L, 1, hidden),
                layers["q_norm"].reshape(L, 1, d),
                layers["k_norm"].reshape(L, 1, d),
                final_norm.reshape(1, hidden),
                layers["qkv_proj_s4"], layers["o_proj_s4"],
                layers["gate_up_proj_s4"], layers["down_proj_s4"],
                head_s4.reshape(head_s4.shape[-2], vocab),
                qkv_q, o_q, gu_q, down_q, head_q4,
                k_cache, v_cache]
    if kv_quant:
        out_shape += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                      jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        # scales are VMEM-resident (no DMA slicing: their 8-wide lane dim
        # cannot be DMA-sliced under Mosaic's 128-lane alignment rule)
        in_specs += [vmem, vmem]
        out_specs += [vmem, vmem]
        aliases = {20: 2, 21: 3, 22: 4, 23: 5}
        operands += [k_scale, v_scale]

    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(*operands)
    return res
