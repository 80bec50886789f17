"""1D convolution primitives in NWC layout (TPU/XLA-friendly).

Causal padding semantics replicate the reference exactly
(Qwen3TTSTokenizerV2CausalConvNet / CausalTransConvNet,
modeling_qwen3_tts_tokenizer_v2.py:159-207): left-pad by
(K_eff - stride), plus the "extra" right pad for stride>1, and
transposed convs trim (K - stride) from both sides.

Weight layouts: conv weights (K, I, O) — converted from torch (O, I, K)
at load; transposed-conv weights (K, O, I) — from torch (I, O, K) via
transpose(2, 1, 0) — which is what `conv_transpose(transpose_kernel=True)`
expects with WIO dimension numbers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_DN = ("NWC", "WIO", "NWC")


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
           stride: int = 1, dilation: int = 1, groups: int = 1,
           padding="VALID") -> jax.Array:
    """x: (B, T, C_in); w: (K, C_in/groups, C_out)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def causal_conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
                  stride: int = 1, dilation: int = 1, groups: int = 1) -> jax.Array:
    """Reference CausalConvNet: left pad (K_eff - stride) + extra right pad so
    the strided output covers the whole signal."""
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride
    length = x.shape[1]
    n_frames = (length - k_eff + pad_left) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad_left)
    pad_right = max(ideal - length, 0)
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    return conv1d(x, w, b, stride=stride, dilation=dilation, groups=groups)


def causal_transconv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
                       stride: int = 1) -> jax.Array:
    """Reference CausalTransConvNet: full transposed conv then trim
    (K - stride) from BOTH sides (modeling_..._v2.py:195-207)."""
    k = w.shape[0]
    y = jax.lax.conv_transpose(
        x, w, strides=(stride,), padding="VALID",
        dimension_numbers=_DN, transpose_kernel=True)
    if b is not None:
        y = y + b
    trim = math.ceil(k - stride)
    if trim > 0:
        y = y[:, trim: y.shape[1] - trim]
    return y


# ---------------------------------------------------------------------------
# MXU-shaped reformulations of the small-channel SEANet convs (r4)
#
# `conv_general_dilated` runs the vocoder's k7 convs at ~10-20 TFLOP/s on v5e
# (examples/bench_conv1d.py): with C_out = 48..768 on the 128-lane dim the MXU
# is underfilled and the conv lowering adds its own overhead. Folding W
# consecutive time steps into the channel dim makes the lane dim W*C_out and
# turns the k-tap dense conv into a TWO-tap conv over super-positions (valid
# whenever k - 1 <= W), i.e. two big (B*T/W, W*C_in) @ (W*C_in, W*C_out)
# matmuls. The folded kernel is block-sparse (w-fraction (k*W)/(2*W*W) =
# k/(2W) nonzero), so the formulation spends 2W/k times the conv's FLOPs —
# a win whenever the MXU-rate gain exceeds that (measured 3-10x net on the
# SEANet shapes, examples/bench_seanet_conv.py).
#
# Dilation d > 1 is handled by phase decomposition: a causal dilated conv is
# exactly d independent causal dense convs over the strided phase sequences
# x[p::d] (every tap of output t touches inputs congruent to t mod d).
# ---------------------------------------------------------------------------


def _fold_kernel(w: jax.Array, fold: int) -> jax.Array:
    """(K, C_in, C_out) -> (2, fold*C_in, fold*C_out) block kernel.

    Output offset u (within a super-position) takes tap k from input offset
    v = u - (K-1) + k: super-position j=1 (current) when v >= 0, j=0
    (previous) when v < 0 (then at offset fold + v)."""
    k, cin, cout = w.shape
    if k - 1 > fold:
        raise ValueError(f"fold {fold} too small for kernel {k} (need >= k-1)")
    w2 = jnp.zeros((2, fold, cin, fold, cout), w.dtype)
    for u in range(fold):
        for kk in range(k):
            v = u - (k - 1) + kk
            j, vv = (1, v) if v >= 0 else (0, v + fold)
            w2 = w2.at[j, vv, :, u, :].set(w[kk])
    return w2.reshape(2, fold * cin, fold * cout)


def folded_causal_conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                         *, dilation: int = 1, fold: int = 8) -> jax.Array:
    """causal_conv1d (stride 1) via the time-folded 2-tap matmul formulation.
    Exact same math (f32 accumulation); see the block comment above."""
    bsz, t, cin = x.shape
    k, _, cout = w.shape
    if dilation > 1:
        d = dilation
        tp = -(-t // d) * d
        xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
        xp = (xp.reshape(bsz, tp // d, d, cin)
              .transpose(0, 2, 1, 3).reshape(bsz * d, tp // d, cin))
        y = folded_causal_conv1d(xp, w, None, dilation=1, fold=fold)
        y = (y.reshape(bsz, d, tp // d, cout)
             .transpose(0, 2, 1, 3).reshape(bsz, tp, cout)[:, :t])
        return y + b if b is not None else y
    tp = -(-t // fold) * fold
    xf = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0))).reshape(bsz, tp // fold,
                                                           fold * cin)
    w2 = _fold_kernel(w, fold)
    xprev = jnp.pad(xf, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    # accumulate each matmul in f32 on the MXU but keep the (large) tap
    # outputs in x.dtype: the block-4 serving shape is ~3.5 GB per buffer
    # in bf16 and f32 temporaries would double the vocoder's peak memory
    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    y = (jnp.einsum("bsc,cd->bsd", xprev, w2[0], preferred_element_type=acc)
         + jnp.einsum("bsc,cd->bsd", xf, w2[1], preferred_element_type=acc))
    y = y.astype(x.dtype).reshape(bsz, tp, cout)[:, :t]
    return y + b if b is not None else y


def phased_causal_transconv1d(x: jax.Array, w: jax.Array,
                              b: jax.Array | None = None, *,
                              stride: int = 1) -> jax.Array:
    """causal_transconv1d as ONE matmul (lanes K*C_out) + phase shift-adds.

    Full transposed conv: y_full[m*s + r] = sum_j x[m - j] @ w[r + j*s]
    (j over taps with r + j*s < K); the per-tap products all come from a
    single (B, T_in, C_in) @ (C_in, K*C_out) matmul, and the trim of
    (K - s) from both sides (reference modeling_..._v2.py:195-207) becomes
    slicing on the (T_in, s) output grid."""
    k, cout, cin = w.shape  # transposed-conv layout (K, O, I)
    s = stride
    bsz, tin, _ = x.shape
    wm = jnp.transpose(w, (2, 0, 1)).reshape(cin, k * cout)
    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    a = jnp.einsum("btc,cd->btd", x, wm,
                   preferred_element_type=acc)  # (B, Tin, K*O)
    a = a.reshape(bsz, tin, k, cout)
    n_full = (tin - 1) * s + k
    # accumulate tap contributions on the full-length grid
    y = jnp.zeros((bsz, n_full, cout), acc)
    n_taps = -(-k // s)
    for j in range(n_taps):
        width = min(k - j * s, s)
        if width <= 0:
            break
        # tap block j covers output offsets r in [0, width) at grid row m
        block = a[:, :, j * s: j * s + width]  # (B, Tin, width, O)
        if width == s:  # contiguous on the (Tin, s) grid
            y = y.at[:, j * s: j * s + tin * s].add(
                block.reshape(bsz, tin * s, cout))
        else:  # k not a multiple of s: strided scatter-add
            idx = (jnp.arange(tin)[:, None] * s + j * s
                   + jnp.arange(width)[None, :]).reshape(-1)
            y = y.at[:, idx].add(block.reshape(bsz, tin * width, cout))
    trim = math.ceil(k - s)
    y = y[:, trim: n_full - trim] if trim > 0 else y
    y = y.astype(x.dtype)
    return y + b if b is not None else y


def transconv1d_right_trim(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
                           stride: int = 1, trim_right_ratio: float = 1.0) -> jax.Array:
    """Mimi/EnCodec-style causal transposed conv: trim padding_total=K-stride
    from the right only (ratio 1.0) — used by the encoder-side downsample."""
    k = w.shape[0]
    y = jax.lax.conv_transpose(
        x, w, strides=(stride,), padding="VALID",
        dimension_numbers=_DN, transpose_kernel=True)
    if b is not None:
        y = y + b
    pad_total = k - stride
    pad_right = math.ceil(pad_total * trim_right_ratio)
    pad_left = pad_total - pad_right
    return y[:, pad_left: y.shape[1] - pad_right if pad_right else y.shape[1]]
