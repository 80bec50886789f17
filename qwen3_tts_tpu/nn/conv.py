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
