"""Fused talker decode-step kernel, layer-PAIR `fori_loop` edition.

Same program as `ops/talker_step.py` (one Pallas dispatch for all L layers +
codec head of the talker decode step, int8 weight streaming, staged-KV
attention — see that module's docstring for the hardware rationale and the
reference call stack, modeling_qwen3_tts.py:1635-1744), with one structural
change: instead of unrolling all L layers in Python, the kernel runs a
`jax.lax.fori_loop` over PAIRS of layers.

Why: the fully-unrolled 28-layer kernel produces so much Mosaic IR that the
b=32 serving program cold-compiles for tens of minutes (measured >14 min
without completion on the 2-core build host — the round-2 bench findings in
NOTES.md). Two layers per iteration cut the IR ~14x while preserving every
pipelining property of the unrolled kernel:

  - the per-layer weight-tile schedule is layer-uniform, so tiles stream
    from `arrays[kind].at[l0 + rel, ...]` with the pair base `l0` as the
    (traced) loop index and `rel` in {0, 1} static;
  - per-SHAPE double-buffer slots repeat with period one pair — every
    weight group consumes an even number of tiles per pair (2 layers x any
    per-layer count), so slot parity is static inside the body and the
    cross-pair prefetch (issued before the last wait of the pair, landing
    in the slot freed two entries earlier) needs no dynamic slot index;
  - KV staging parity is likewise static: slot (rel*nbt + t) % 2, and the
    cross-pair prefetch targets slot 0 because 2*nbt is even.

The loop epilogue drains one in-flight prefetch per weight group and the
KV pair (all issued with the pair base clamped to L-2, so the drain
descriptors are static). The codec head streams through its own
double-buffer after the loop exactly as in the unrolled kernel.

Requires even L (both production talkers: 28; fallback to the unrolled
kernel otherwise — models/talker.py dispatches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .talker_step import NEG, _batch_tile, _rms, _rope, _vmem_estimate
from .tilestream import plan_groups, plan_matrix, tile_shape


def _pair_plan(hidden, qd, kvd, inter):
    """Weight-tile schedule for ONE layer pair (rel layers 0 and 1), in
    exact consumption order; the head is streamed separately."""
    sched = []
    for rel in (0, 1):
        plan_matrix(sched, "qkv", rel, hidden, qd + 2 * kvd)
        plan_matrix(sched, "o", rel, qd, hidden)
        plan_matrix(sched, "gu", rel, hidden, 2 * inter)
        plan_matrix(sched, "down", rel, inter, hidden)
    return sched


class _PairStream:
    """Pair-periodic weight-tile stream: like tilestream.TileStream, but the
    schedule covers one layer pair and the successor of each group's last
    entry is the group's FIRST entry of the next pair (src indexed with the
    traced next-pair base, clamped so the drain descriptor is static)."""

    def __init__(self, sched, shapes, slot_of, nxt, prime, arrays,
                 wbufs, wsems):
        self.sched = sched
        self.slot_of = slot_of
        self.nxt = nxt
        self.prime = prime          # first entry index of each group
        self.arrays = arrays
        self.wbufs = wbufs
        self.wsems = wsems
        self.cursor = 0

    def _dma(self, i, l0):
        kind, rel, i0, it, o0, ot = self.sched[i]
        src = self.arrays[kind].at[l0 + rel, pl.ds(i0, it), pl.ds(o0, ot)]
        g, slot = self.slot_of[i]
        return pltpu.make_async_copy(src, self.wbufs[g].at[slot],
                                     self.wsems[g].at[slot])

    def prime_all(self, l0):
        for i in self.prime:
            self._dma(i, l0).start()

    def drain_all(self, l0):
        for i in self.prime:
            self._dma(i, l0).wait()

    def next_tile(self, l0, l0_next):
        i = self.cursor
        self.cursor = (self.cursor + 1) % len(self.sched)
        if self.nxt[i] is not None:
            self._dma(self.nxt[i], l0).start()
        else:  # group's last entry this pair -> prefetch its next-pair first
            g = self.slot_of[i][0]
            self._dma(self.prime[g], l0_next).start()
        self._dma(i, l0).wait()
        g, slot = self.slot_of[i]
        return self.wbufs[g][slot].astype(jnp.bfloat16)

    def matmul(self, b, h_full, in_w, out_w, scale_row, l0, l0_next):
        """scale_row: (1, out_w) f32."""
        it, ot = tile_shape(in_w, out_w)
        outs = []
        for o0 in range(0, out_w, ot):
            acc = jnp.zeros((b, ot), jnp.float32)
            for i0 in range(0, in_w, it):
                w = self.next_tile(l0, l0_next)
                acc = acc + jnp.dot(h_full[:, i0:i0 + it], w,
                                    preferred_element_type=jnp.float32)
            outs.append(acc * scale_row[:, o0:o0 + ot])
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def _loop_kernel(x_ref, cos_ref, sin_ref, pad_ref, idx_ref,
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

    sched = _pair_plan(hidden, qd, kvd, inter)
    shapes, slot_of, nxt, prime = plan_groups(sched)
    ns = len(shapes)
    (hbuf, hsem, kbuf, vbuf, knew, vnew,
     ksem, vsem, osem) = scratch[2 * ns:]
    arrays = {"qkv": qkv_q_ref, "o": o_q_ref, "gu": gu_q_ref,
              "down": down_q_ref}

    bt = _batch_tile(b, s_max, nkv, d)
    nbt = b // bt

    def kv_in(l_arr, rel, t):
        slot = (rel * nbt + t) % 2
        return (pltpu.make_async_copy(kc_ref.at[l_arr, pl.ds(t * bt, bt)],
                                      kbuf.at[slot], ksem.at[slot]),
                pltpu.make_async_copy(vc_ref.at[l_arr, pl.ds(t * bt, bt)],
                                      vbuf.at[slot], vsem.at[slot]))

    def kv_start(l_arr, rel, t):
        pair = kv_in(l_arr, rel, t)
        pair[0].start()
        pair[1].start()

    stream = _PairStream(sched, shapes, slot_of, nxt, prime, arrays,
                         scratch[:ns], scratch[ns:2 * ns])
    stream.prime_all(jnp.int32(0))
    kv_start(jnp.int32(0), 0, 0)

    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)
    slot_b1s = jax.lax.broadcasted_iota(jnp.int32, (b, 1, s_max), 2)
    slot_bs1d = jax.lax.broadcasted_iota(jnp.int32, (1, s_max, 1, 1), 1)
    pad_ok = pad_ref[:] > 0                                     # (B, S)
    visible = (slot_b1s <= idx) & pad_ok[:, None, :]            # (B, 1, S)
    g_rep = nq // nkv
    last_pair = jnp.int32(num_layers - 2)

    def row(ref, l_arr):
        """(1, W) row `l_arr` of a (L, W) VMEM-resident table, selected by a
        masked reduction: Mosaic cannot statically prove sublane alignment
        for a dynamic `pl.ds(l_arr, 1)` load (bf16 needs multiples of the
        packing factor), and these tables are tiny (<=1.4 MB for the gu
        scales), so an O(L*W) VPU select is cheaper than restructuring the
        layout. Always reduces in f32 (both use sites want f32 anyway)."""
        tab = ref[:].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tab.shape[0], 1), 0)
        return jnp.sum(jnp.where(lane == l_arr, tab, 0.0), axis=0,
                       keepdims=True)

    def one_layer(x, l0, l0_next, rel):
        """rel is STATIC (0 or 1); l0/l0_next are traced pair bases."""
        l_arr = l0 + rel
        h = _rms(x, row(in_ln_ref, l_arr), eps)

        qkv = stream.matmul(b, h, hidden, qd + 2 * kvd,
                            row(qkv_s_ref, l_arr).astype(jnp.float32),
                            l0, l0_next)
        q = qkv[:, :qd].astype(jnp.bfloat16).reshape(b, nq, d)
        k = qkv[:, qd:qd + kvd].astype(jnp.bfloat16).reshape(b, nkv, d)
        v = qkv[:, qd + kvd:].astype(jnp.bfloat16).reshape(b, nkv, d)

        q = _rms(q, row(qn_ref, l_arr), eps)
        k = _rms(k, row(kn_ref, l_arr), eps)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)

        ctxs = []
        writes = []
        for t in range(nbt):
            kin = kv_in(l_arr, rel, t)
            kin[0].wait()
            kin[1].wait()
            slot = (rel * nbt + t) % 2
            kb = kbuf[slot]  # (bt, S, NKV, D)
            vb = vbuf[slot]
            kt_new = jax.lax.slice_in_dim(k, t * bt, (t + 1) * bt, axis=0)
            vt_new = jax.lax.slice_in_dim(v, t * bt, (t + 1) * bt, axis=0)
            kfull = jnp.where(slot_bs1d == idx,
                              kt_new[:, None].astype(kb.dtype), kb)
            vfull = jnp.where(slot_bs1d == idx,
                              vt_new[:, None].astype(vb.dtype), vb)
            if writes:
                writes[-1][0].wait()
                writes[-1][1].wait()
            knew[:] = kt_new[:, None].astype(knew.dtype)
            vnew[:] = vt_new[:, None].astype(vnew.dtype)
            ko = (pltpu.make_async_copy(
                      knew, kc_out.at[l_arr, pl.ds(t * bt, bt), pl.ds(idx, 1)],
                      osem.at[0]),
                  pltpu.make_async_copy(
                      vnew, vc_out.at[l_arr, pl.ds(t * bt, bt), pl.ds(idx, 1)],
                      osem.at[1]))
            ko[0].start()
            ko[1].start()
            writes.append(ko)
            # prefetch the next KV stage while this tile's attention runs
            if t + 1 < nbt:
                kv_start(l_arr, rel, t + 1)

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

        attn = stream.matmul(b, ctx, qd, hidden,
                             row(o_s_ref, l_arr).astype(jnp.float32),
                             l0, l0_next)
        x = x + attn.astype(x.dtype)

        h2 = _rms(x, row(post_ln_ref, l_arr), eps)
        gu = stream.matmul(b, h2, hidden, 2 * inter,
                           row(gu_s_ref, l_arr).astype(jnp.float32),
                           l0, l0_next)
        gate = gu[:, :inter]
        up = gu[:, inter:]
        act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)

        # next KV stage (rel 1 of this pair, or rel 0 of the next pair)
        # prefetched during the down matmuls; slot writes drained first so
        # their source scratch can be reused
        writes[-1][0].wait()
        writes[-1][1].wait()
        if rel == 0:
            kv_start(l0 + 1, 1, 0)
        else:
            kv_start(l0_next, 0, 0)

        down = stream.matmul(b, act, inter, hidden,
                             row(down_s_ref, l_arr).astype(jnp.float32),
                             l0, l0_next)
        return x + down.astype(x.dtype)

    def pair_body(i, x):
        l0 = (2 * i).astype(jnp.int32)
        # clamp so the final pair's prefetches hit valid rows and the drain
        # descriptors below are static (L-2)
        l0_next = jnp.minimum(l0 + 2, last_pair)
        x = one_layer(x, l0, l0_next, 0)
        x = one_layer(x, l0, l0_next, 1)
        return x

    x = jax.lax.fori_loop(0, num_layers // 2, pair_body, x_ref[:],
                          unroll=False)

    # drain the final pair's in-flight prefetches (issued with base L-2)
    stream.drain_all(last_pair)
    kv_in(last_pair, 0, 0)[0].wait()
    kv_in(last_pair, 0, 0)[1].wait()

    last_h = _rms(x, fn_ref[0], eps)
    h_out_ref[:] = last_h

    # codec head: own double-buffered stream (layerless)
    it, ot = tile_shape(hidden, vocab)
    n_i, n_o = hidden // it, vocab // ot
    tiles = [(o0, i0) for o0 in range(0, vocab, ot)
             for i0 in range(0, hidden, it)]

    def head_dma(j, slot):
        o0, i0 = tiles[j]
        return pltpu.make_async_copy(
            head_q_ref.at[pl.ds(i0, it), pl.ds(o0, ot)],
            hbuf.at[slot], hsem.at[slot])

    head_dma(0, 0).start()
    head_s = head_s_ref[0].astype(jnp.float32)
    outs = []
    acc = jnp.zeros((b, ot), jnp.float32)
    for j, (o0, i0) in enumerate(tiles):
        if j + 1 < len(tiles):
            head_dma(j + 1, (j + 1) % 2).start()
        head_dma(j, j % 2).wait()
        w = hbuf[j % 2].astype(jnp.bfloat16)
        acc = acc + jnp.dot(last_h[:, i0:i0 + it], w,
                            preferred_element_type=jnp.float32)
        if i0 + it >= hidden:
            outs.append(acc * head_s[o0:o0 + ot][None, :])
            acc = jnp.zeros((b, ot), jnp.float32)
    logits_ref[:] = (jnp.concatenate(outs, axis=-1)
                     if len(outs) > 1 else outs[0])


@functools.partial(jax.jit, static_argnames=("num_layers", "eps", "interpret"),
                   donate_argnums=(11, 12))
def fused_talker_step_loop(layers: dict, final_norm: jax.Array,
                           head_q: jax.Array, head_s: jax.Array,
                           x: jax.Array, cos: jax.Array, sin: jax.Array,
                           pad_mask: jax.Array, index: jax.Array,
                           num_layers: int, eps: float,
                           k_cache: jax.Array, v_cache: jax.Array,
                           interpret: bool = False):
    """Drop-in replacement for `talker_step.fused_talker_step` (same
    arguments, layouts, and semantics — see that function's docstring)
    using the layer-pair fori_loop kernel. Requires even num_layers."""
    b, hidden = x.shape
    L, _, s_max, nkv, d = k_cache.shape
    assert L == num_layers and num_layers % 2 == 0
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
        _loop_kernel, num_layers=num_layers, eps=eps,
        nq=nq, nkv=nkv, d=d, inter=inter, vocab=vocab)

    sched = _pair_plan(hidden, qd, nkv * d, inter)
    shapes, _, _, _ = plan_groups(sched)
    wbuf_scratch = [pltpu.VMEM((2, it, ot), jnp.int8) for it, ot in shapes]
    wsem_scratch = [pltpu.SemaphoreType.DMA((2,)) for _ in shapes]
    h_it, h_ot = tile_shape(hidden, vocab)
    bt = _batch_tile(b, s_max, nkv, d)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    limit = min(_vmem_estimate(shapes + [(h_it, h_ot)], b, bt, s_max, nkv, d,
                               vocab, hidden, inter), 100 << 20)

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
            pltpu.VMEM((2, h_it, h_ot), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
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
