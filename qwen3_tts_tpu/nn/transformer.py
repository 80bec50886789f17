"""Generic pre-norm GQA decoder stack, weight-stacked and scan-compiled.

One implementation serves the talker (20-28L, q/k-norm, mRoPE-as-1D), the
code predictor (5L, q/k-norm) and the codec-decoder transformer (8L,
sliding-window 72, LayerScale). Reference layer semantics:
modeling_qwen3_tts.py:961-1012 / 1348-1424 and
modeling_qwen3_tts_tokenizer_v2.py:408-471.

Layer weights are stacked along a leading L axis and the stack runs under
`jax.lax.scan`, which keeps compile time O(1) in depth and lets the KV cache
ride the scan as a carried/mapped operand.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .attention import gqa_attention, gqa_attention_quant
from .cache import KVCache, quantize_kv
from .layers import layer_norm, linear, rms_norm, swiglu_mlp
from .rope import apply_rope


@dataclass(frozen=True)
class DecoderSpec:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    sliding_window: int | None = None
    qk_norm: bool = True
    layer_scale: bool = False
    attention_bias: bool = False
    norm_type: str = "rms"      # "rms" | "layer" (Mimi uses LayerNorm)
    mlp_type: str = "swiglu"    # "swiglu" | "gelu" (Mimi uses fc1/gelu/fc2)
    final_norm: bool = True     # Mimi transformer has no final norm

    @property
    def scaling(self) -> float:
        return self.head_dim ** -0.5


def init_stack_params(key: jax.Array, spec: DecoderSpec, dtype=jnp.float32) -> dict:
    """Random-init stacked layer params (testing / from-scratch training)."""
    L, H, D = spec.num_layers, spec.hidden_size, spec.head_dim
    HD, KD, I = spec.num_heads * D, spec.num_kv_heads * D, spec.intermediate_size
    ks = jax.random.split(key, 8)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    p = {
        "input_layernorm": jnp.ones((L, H), dtype),
        "post_attention_layernorm": jnp.ones((L, H), dtype),
        "q_proj": rnd(ks[0], (L, H, HD)),
        "k_proj": rnd(ks[1], (L, H, KD)),
        "v_proj": rnd(ks[2], (L, H, KD)),
        "o_proj": rnd(ks[3], (L, HD, H)),
    }
    if spec.mlp_type == "swiglu":
        p.update({
            "gate_proj": rnd(ks[4], (L, H, I)),
            "up_proj": rnd(ks[5], (L, H, I)),
            "down_proj": rnd(ks[6], (L, I, H)),
        })
    else:
        p.update({
            "fc1": rnd(ks[4], (L, H, I)),
            "fc2": rnd(ks[5], (L, I, H)),
        })
    if spec.norm_type == "layer":
        p["input_layernorm_b"] = jnp.zeros((L, H), dtype)
        p["post_attention_layernorm_b"] = jnp.zeros((L, H), dtype)
    if spec.final_norm:
        p["norm"] = jnp.ones((H,), dtype)
    if spec.qk_norm:
        p["q_norm"] = jnp.ones((L, D), dtype)
        p["k_norm"] = jnp.ones((L, D), dtype)
    if spec.layer_scale:
        p["attn_scale"] = jnp.full((L, H), 0.01, dtype)
        p["mlp_scale"] = jnp.full((L, H), 0.01, dtype)
    if spec.attention_bias:
        p["q_bias"] = jnp.zeros((L, HD), dtype)
        p["k_bias"] = jnp.zeros((L, KD), dtype)
        p["v_bias"] = jnp.zeros((L, KD), dtype)
        p["o_bias"] = jnp.zeros((L, H), dtype)
    return p


def _dequant4(q: jax.Array, s: jax.Array) -> jax.Array:
    """Group-wise int4 dequant -> (..., in, out) in s.dtype.

    q is the PACKED container: uint8 (..., in//2, out) holding the matrix
    HALF-SPLIT along the contraction dim — packed row i stores W[i] in the
    low nibble and W[in//2 + i] in the high nibble (biased, value+8 in
    [1, 15]). Half-split beats adjacent-row packing for both consumers:
      - XLA: the unpack is two elementwise shift/mask chains + a concat of
        contiguous halves (no sublane interleave that defeats operand
        fusion — the adjacent-row layout's stack+reshape measured 30.9 ms
        for the b=1 decode step vs 5.5 ms int8, r4 notes);
      - the fused Pallas step kernel streams packed tiles and consumes the
        two halves as two matmul operands directly (ops/talker_step_q4.py).
    A packed uint8 container is used instead of native jnp.int4 because
    this runtime's S4 jit-argument path is broken (re-entrant jit during
    tiled-layout canonicalization, r4 notes). Group scales (s (..., G, out))
    must align with the halves: G == 1 or even (quantize_stack_params_int4
    enforces this by widening the group when cin % (2*group) != 0)."""
    half = q.shape[-2]
    lead = q.shape[:-2]
    cout = q.shape[-1]
    qs = jax.lax.bitcast_convert_type(q, jnp.int8)
    lo = (qs & jnp.int8(0x0F)) - 8                    # W[:half], biased nibble
    # W[half:] is stored as a SIGNED 4-bit nibble (two's complement): the
    # arithmetic >> of the bitcast int8 sign-extends it to the value
    # directly. (Mosaic cannot shift int8 at all — the kernel extracts the
    # same nibble shift-free as (qs - (qs & 0xF)) * 1/16; r4 probe.)
    hi = jax.lax.bitcast_convert_type(q, jnp.int8) >> jnp.int8(4)
    n_groups = s.shape[-2]
    if n_groups == 1:
        w = jnp.concatenate([lo, hi], axis=-2).astype(s.dtype)
        return w * s
    # half-split layout requires the scale groups to split evenly across the
    # halves AND group boundaries to align with the half boundary; an odd
    # group count (hand-built or older-quantizer container) would silently
    # map scales to the wrong halves
    if n_groups % 2:
        raise ValueError(
            f"_dequant4: scale group count {n_groups} must be 1 or even for "
            f"the half-split int4 container (see quantize_stack_params_int4)")
    ng2 = n_groups // 2
    if half % ng2:
        raise ValueError(
            f"_dequant4: {ng2} groups per half do not divide the packed row "
            f"count {half}")
    g = half // ng2

    def dq(part, s_part):
        pf = part.astype(s.dtype).reshape(*lead, ng2, g, cout)
        return (pf * s_part[..., :, None, :]).reshape(*lead, half, cout)

    return jnp.concatenate(
        [dq(lo, s[..., :ng2, :]), dq(hi, s[..., ng2:, :])], axis=-2)


def _pack4(q: jax.Array) -> jax.Array:
    """(..., in, out) int values in [-7, 7] -> packed uint8 (..., in//2, out),
    half-split along the contraction dim (see _dequant4). The low half is
    stored biased (+8 in [1, 15]); the high half as signed two's-complement
    nibbles (shift-free extraction in the Pallas kernel)."""
    half = q.shape[-2] // 2
    lo = (q[..., :half, :] + 8).astype(jnp.uint8)
    hi = (q[..., half:, :] % 16).astype(jnp.uint8)   # signed 4-bit bits
    return lo | (hi << jnp.uint8(4))


def _proj(lw: dict, name: str, x: jax.Array, bias_name: str | None = None) -> jax.Array:
    """Projection through a bf16 weight, an int8 weight-only quantized pair
    (name_q int8 (in,out) + name_s per-out-channel scale), or a group-wise
    int4 pair (name_q4 + name_s4 (in//G,out) scales). XLA fuses the dequant
    into the matmul operand read, halving (int8) / quartering (int4) the
    HBM weight traffic of the bandwidth-bound decode step."""
    b = lw.get(bias_name) if bias_name else None
    if name + "_q4" in lw:
        return linear(x, _dequant4(lw[name + "_q4"], lw[name + "_s4"]).astype(x.dtype), b)
    if name + "_q" in lw:
        w = lw[name + "_q"].astype(x.dtype) * lw[name + "_s"]
        return linear(x, w, b)
    return linear(x, lw[name], b)


def fuse_stack_params(layers: dict) -> dict:
    """Merge q/k/v -> qkv_proj and gate/up -> gate_up_proj. Halves the small-
    matmul count per layer — significant for the latency-bound sub-talker
    micro-steps (7 -> 4 matmuls/layer)."""
    out = dict(layers)
    if "q_proj" in out:
        out["qkv_proj"] = jnp.concatenate(
            [out.pop("q_proj"), out.pop("k_proj"), out.pop("v_proj")], axis=-1)
        if "q_bias" in out:
            out["qkv_bias"] = jnp.concatenate(
                [out.pop("q_bias"), out.pop("k_bias"), out.pop("v_bias")], axis=-1)
    if "gate_proj" in out:
        out["gate_up_proj"] = jnp.concatenate(
            [out.pop("gate_proj"), out.pop("up_proj")], axis=-1)
    return out


_QUANT_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
                "down_proj", "fc1", "fc2", "qkv_proj", "gate_up_proj")


def quantize_stack_params(layers: dict, names=_QUANT_NAMES) -> dict:
    """Weight-only int8 per-output-channel quantization of a layer stack.
    weights (L, in, out) -> int8 + (L, 1, out) scales."""
    out = dict(layers)
    for name in names:
        if name not in layers:
            continue
        w = jnp.asarray(layers[name], jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        out[name + "_q"] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        out[name + "_s"] = scale.astype(jnp.bfloat16)
        del out[name]
    return out


def quantize_stack_params_int4(layers: dict, group: int = 128,
                               names=_QUANT_NAMES) -> dict:
    """Weight-only GROUP-WISE int4 quantization (r3 verdict next-round #3):
    weights (L, in, out) -> nibble-packed uint8 (L, in//2, out) values +
    (L, in//group, out) bf16 scales (max-abs per contraction group per
    output channel). Quarters the b=1 weight read vs bf16; logit-delta
    bound tested in tests/test_int4.py."""
    out = dict(layers)
    for name in names:
        if name not in layers:
            continue
        w = jnp.asarray(layers[name], jnp.float32)
        l, cin, cout = w.shape
        g = group if cin % group == 0 else cin
        if (cin // g) > 1 and (cin // g) % 2:
            g = cin  # half-split packing needs an even group count (or 1)
        wg = w.reshape(l, cin // g, g, cout)
        scale = jnp.max(jnp.abs(wg), axis=2, keepdims=True) / 7.0
        scale = jnp.maximum(scale, 1e-8)
        # quantize against the STORED (bf16-rounded) scale so the dequant
        # roundtrip error is bounded by scale/2 exactly
        scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.clip(jnp.round(wg / scale), -7, 7)
        out[name + "_q4"] = _pack4(q.reshape(l, cin, cout).astype(jnp.int8))
        out[name + "_s4"] = scale[:, :, 0, :].astype(jnp.bfloat16)
        del out[name]
    return out


def _layer(spec: DecoderSpec, lw: dict, x: jax.Array, cos: jax.Array, sin: jax.Array,
           mask: jax.Array | None, k_full: jax.Array | None, v_full: jax.Array | None,
           write_index: jax.Array | None, flash_pad_mask: jax.Array | None = None,
           flash_interpret: bool = False, layer_idx: jax.Array | None = None,
           k_s_full: jax.Array | None = None, v_s_full: jax.Array | None = None):
    """Single decoder layer.

    Cache handling (decode-critical): when layer_idx is given, k_full/v_full
    are the FULL stacked cache buffers (L,B,S,Hkv,D) carried through the
    layer scan — this layer's new k/v slot is written with a tiny
    dynamic-update-slice that XLA performs IN PLACE on the loop carry, and
    attention reads the updated layer slice. The previous design mapped the
    cache over scan xs/ys, which forced a full cache copy (read+write of
    every layer's (B,S,Hkv,D) buffer) per decode step — at the 1.7B serving
    shape that is ~3.8 GB of pure copy traffic per frame, measured 19.6 ms
    at b=32 and OOM at b=128 (r3 profiling; the HLO showed a second
    KV-sized AllocateBuffer temp).

    Without a cache (k_full None), plain cache-free prefill.

    flash_pad_mask (B, T): when set, attention runs through the Pallas flash
    kernel over the LOCAL k/v (valid only for prefill at cache index 0, where
    local attention equals cached attention). Returns (y, k_out, v_out)."""
    b, t, _ = x.shape

    def norm(z, which):
        if spec.norm_type == "layer":
            return layer_norm(z, lw[which], lw[which + "_b"], spec.rms_norm_eps)
        return rms_norm(z, lw[which], spec.rms_norm_eps)

    h = norm(x, "input_layernorm")

    qd = spec.num_heads * spec.head_dim
    kd = spec.num_kv_heads * spec.head_dim
    if "qkv_proj" in lw or "qkv_proj_q" in lw or "qkv_proj_q4" in lw:
        qkv = _proj(lw, "qkv_proj", h, "qkv_bias")
        q, k, v = qkv[..., :qd], qkv[..., qd:qd + kd], qkv[..., qd + kd:]
    else:
        q = _proj(lw, "q_proj", h, "q_bias")
        k = _proj(lw, "k_proj", h, "k_bias")
        v = _proj(lw, "v_proj", h, "v_bias")
    q = q.reshape(b, t, spec.num_heads, spec.head_dim)
    k = k.reshape(b, t, spec.num_kv_heads, spec.head_dim)
    v = v.reshape(b, t, spec.num_kv_heads, spec.head_dim)
    if spec.qk_norm:
        q = rms_norm(q, lw["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, lw["k_norm"], spec.rms_norm_eps)
    q, k = apply_rope(q, k, cos, sin)

    ks_out, vs_out = k_s_full, v_s_full
    if k_full is not None and layer_idx is not None:
        # in-place slot write into the carried (L,B,S,Hkv,D) stack, then
        # attend over this layer's updated slice (the slice read fuses into
        # the attention dots; the carry update is done in place by XLA)
        if k_s_full is not None:  # int8 KV cache: write values + scales
            k_w, k_sc = quantize_kv(k)
            v_w, v_sc = quantize_kv(v)
            ks_out = jax.lax.dynamic_update_slice(
                k_s_full, k_sc[None], (layer_idx, 0, write_index, 0))
            vs_out = jax.lax.dynamic_update_slice(
                v_s_full, v_sc[None], (layer_idx, 0, write_index, 0))
        else:
            k_w = k.astype(k_full.dtype)
            v_w = v.astype(v_full.dtype)
        k_out = jax.lax.dynamic_update_slice(
            k_full, k_w[None], (layer_idx, 0, write_index, 0, 0))
        v_out = jax.lax.dynamic_update_slice(
            v_full, v_w[None], (layer_idx, 0, write_index, 0, 0))
        if flash_pad_mask is not None:
            from ..ops.flash_attention import flash_prefill_attention

            attn = flash_prefill_attention(q, k, v, flash_pad_mask, spec.scaling,
                                           spec.sliding_window,
                                           interpret=flash_interpret)
        elif k_s_full is not None:
            k_l = jax.lax.dynamic_index_in_dim(k_out, layer_idx, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(v_out, layer_idx, 0, keepdims=False)
            ks_l = jax.lax.dynamic_index_in_dim(ks_out, layer_idx, 0, keepdims=False)
            vs_l = jax.lax.dynamic_index_in_dim(vs_out, layer_idx, 0, keepdims=False)
            attn = gqa_attention_quant(q, k_l, ks_l, v_l, vs_l, mask,
                                       spec.scaling)
        else:
            k_l = jax.lax.dynamic_index_in_dim(k_out, layer_idx, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(v_out, layer_idx, 0, keepdims=False)
            attn = gqa_attention(q, k_l, v_l, mask, spec.scaling)
    elif flash_pad_mask is not None:
        from ..ops.flash_attention import flash_prefill_attention

        k_out, v_out = k, v
        attn = flash_prefill_attention(q, k, v, flash_pad_mask, spec.scaling,
                                       spec.sliding_window, interpret=flash_interpret)
    else:
        k_out, v_out = k, v
        attn = gqa_attention(q, k, v, mask, spec.scaling)

    attn = _proj(lw, "o_proj", attn.reshape(b, t, -1), "o_bias")
    if spec.layer_scale:
        attn = attn * lw["attn_scale"]
    x = x + attn

    h = norm(x, "post_attention_layernorm")
    if spec.mlp_type == "swiglu":
        if "gate_up_proj" in lw or "gate_up_proj_q" in lw or "gate_up_proj_q4" in lw:
            gu = _proj(lw, "gate_up_proj", h)
            g, u = jnp.split(gu, 2, axis=-1)
            g = jax.nn.silu(g)
        else:
            g = jax.nn.silu(_proj(lw, "gate_proj", h))
            u = _proj(lw, "up_proj", h)
        mlp = _proj(lw, "down_proj", g * u)
    else:
        mlp = _proj(lw, "fc2", jax.nn.gelu(_proj(lw, "fc1", h), approximate=False))
    if spec.layer_scale:
        mlp = mlp * lw["mlp_scale"]
    return x + mlp, k_out, v_out, ks_out, vs_out


def _split_layer_weights(params: dict) -> dict:
    return {k: v for k, v in params.items() if k != "norm"}


def stack_forward(spec: DecoderSpec, params: dict, x: jax.Array, cos: jax.Array,
                  sin: jax.Array, mask: jax.Array | None,
                  cache: KVCache | None = None,
                  flash_pad_mask: jax.Array | None = None,
                  flash_interpret: bool = False) -> tuple[jax.Array, KVCache | None]:
    """Run the full stack. With a cache, k/v of this call are written at
    cache.index and attention covers the cache buffers (prefill into cache or
    single/multi-token decode). Without, plain full-sequence forward.

    x: (B, T, H); cos/sin: (B, T, D); mask: (B,1,T,S) bool, S = cache len or T.
    flash_pad_mask (B, T): route attention through the Pallas flash-prefill
    kernel (only correct when this call IS the prefill, cache.index == 0).
    """
    layer_ws = _split_layer_weights(params)

    def maybe_final_norm(h):
        if spec.final_norm:
            return rms_norm(h, params["norm"], spec.rms_norm_eps)
        return h

    if cache is None:
        def body(h, lw):
            h, _, _, _, _ = _layer(spec, lw, h, cos, sin, mask, None, None,
                                   None, flash_pad_mask, flash_interpret)
            return h, None

        x, _ = jax.lax.scan(body, x, layer_ws)
        return maybe_final_norm(x), None

    idx = cache.index

    if x.shape[1] == 1:
        # DECODE (t==1, the serving hot path): statically unrolled layer
        # loop. Each layer writes its one new KV slot into the full stacked
        # buffer with a static-index dynamic-update-slice (in place on the
        # donated buffer) and attends over the layer's STATIC slice, which
        # fuses into the attention dots without materializing a copy. The
        # scan-carried variant below keeps a traced layer index, whose
        # dynamic slice read materialized a (B,S,Hkv,D) copy per layer —
        # measured 17.2 vs ~6.5 ms roofline at b=64 (r3 profiling).
        kbuf, vbuf = cache.k, cache.v
        ks, vs = cache.k_scale, cache.v_scale
        for l in range(spec.num_layers):
            lw = {k: v[l] for k, v in layer_ws.items()}
            x, kbuf, vbuf, ks, vs = _layer(
                spec, lw, x, cos, sin, mask, kbuf, vbuf, idx,
                flash_pad_mask, flash_interpret, layer_idx=l,
                k_s_full=ks, v_s_full=vs)
        new_cache = KVCache(k=kbuf, v=vbuf, index=idx + 1,
                            k_scale=ks, v_scale=vs)
        return maybe_final_norm(x), new_cache

    # PREFILL into cache: scan keeps compile time O(1) in depth; the cache
    # buffers ride the CARRY (not xs/ys) so each layer writes only its new
    # (B,T,Hkv,D) slots in place instead of copying the full cache
    def body(carry, lw):
        h, kbuf, vbuf, ks, vs, l = carry
        h, kbuf, vbuf, ks, vs = _layer(
            spec, lw, h, cos, sin, mask, kbuf, vbuf, idx,
            flash_pad_mask, flash_interpret, layer_idx=l,
            k_s_full=ks, v_s_full=vs)
        return (h, kbuf, vbuf, ks, vs, l + 1), None

    (x, k_new, v_new, ks_new, vs_new, _), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale,
               jnp.int32(0)), layer_ws)
    new_cache = KVCache(k=k_new, v=v_new, index=idx + x.shape[1],
                        k_scale=ks_new, v_scale=vs_new)
    return maybe_final_norm(x), new_cache


def cache_attention_mask(pad_mask: jax.Array, q_len: int, index: jax.Array,
                         max_len: int, sliding_window: int | None = None) -> jax.Array:
    """(B, 1, q_len, S_max) boolean mask for cached attention.

    pad_mask: (B, S_max) validity of every cache slot (left-padding aware);
    callers mark slots >= index+q_len as invalid implicitly since queries are
    causal w.r.t. slot id: query slot (index+i) sees key slot j iff j <= index+i.
    """
    q_slots = index + jnp.arange(q_len)[:, None]  # (q_len, 1)
    k_slots = jnp.arange(max_len)[None, :]        # (1, S_max)
    m = k_slots <= q_slots
    if sliding_window is not None:
        m = m & (k_slots > q_slots - sliding_window)
    return m[None, None] & pad_mask.astype(bool)[:, None, None, :]
