"""25Hz legacy decoder stage 2: BigVGAN vocoder.

Reference Qwen3TTSTokenizerV1DecoderBigVGANModel (modeling_..._v1.py:
698-1067): mel db-normalization, conv_pre, 6 transposed-conv upsample stages
(rates 5,3,2,2,2,2), AMP residual blocks with anti-aliased SnakeBeta
(Kaiser-windowed 2x up/oversample -> snake -> 2x down), final conv, clamp.
NWC layout throughout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config import BigVGANConfig
from ...nn.conv import conv1d
from ..codec_decoder import snake_beta


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass (reference :739-782). Returns (K,)."""
    is_even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)  # numpy kaiser == torch periodic=False
    if is_even:
        time_idx = np.arange(-half_size, half_size) + 0.5
    else:
        time_idx = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((kernel_size,), np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time_idx)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def upsample1d(x: jax.Array, ratio: int = 2, kernel_size: int = 12) -> jax.Array:
    """Anti-aliased 2x upsample (reference UpSample1d :785-807). x (B, T, C).

    The grouped transposed conv is realized as zero-stuffing + depthwise conv
    (the Kaiser-sinc filter is palindromic, so no kernel flip is needed)."""
    b, _, c = x.shape
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size),
                       x.dtype)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    tt = x.shape[1]
    z = jnp.zeros((b, (tt - 1) * stride + 1, c), x.dtype).at[:, ::stride].set(x)
    z = jnp.pad(z, ((0, 0), (kernel_size - 1, kernel_size - 1), (0, 0)))
    w = jnp.broadcast_to(filt[:, None, None], (kernel_size, 1, c))
    y = conv1d(z, w, groups=c) * ratio
    return y[:, pad_left: y.shape[1] - pad_right]


def downsample1d(x: jax.Array, ratio: int = 2, kernel_size: int = 12) -> jax.Array:
    """Anti-aliased 2x downsample (reference DownSample1d :810-832)."""
    c = x.shape[-1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    w = jnp.broadcast_to(filt[:, None, None], (kernel_size, 1, c))
    return conv1d(x, w, stride=ratio, groups=c)


def aa_snake(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Anti-aliased SnakeBeta (reference TorchActivation1d :835-856)."""
    h = upsample1d(x)
    h = snake_beta(h, alpha, beta)
    return downsample1d(h)


def causal_conv(x, w, b, dilation=1):
    k = w.shape[0]
    pad = dilation * (k - 1)
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return conv1d(x, w, b, dilation=dilation)


def same_conv(x, w, b, dilation=1):
    k = w.shape[0]
    total = dilation * (k - 1)
    left = total // 2
    x = jnp.pad(x, ((0, 0), (left, total - left), (0, 0)))
    return conv1d(x, w, b, dilation=dilation)


def amp_block(x: jax.Array, p: dict, dilations: tuple, causal_type: str) -> jax.Array:
    """AMP residual block (reference :868-992)."""
    if causal_type == "2":
        h = same_conv(x, p["pre_conv_w"], p["pre_conv_b"])
        h = aa_snake(h, p["pre_act_alpha"], p["pre_act_beta"])
    else:
        h = x
    # NOTE reference dataflow (:982-992): the residual chain feeds the conv2
    # output of iteration i (not the accumulated x) into iteration i+1.
    for i, d in enumerate(dilations):
        a1 = p["acts"][2 * i]
        a2 = p["acts"][2 * i + 1]
        h = aa_snake(h, a1["alpha"], a1["beta"])
        h = causal_conv(h, p["convs1"][i]["w"], p["convs1"][i]["b"], dilation=d)
        h = aa_snake(h, a2["alpha"], a2["beta"])
        c2 = p["convs2"][i]
        if causal_type == "1":
            h = same_conv(h, c2["w"], c2["b"])
        else:
            h = causal_conv(h, c2["w"], c2["b"])
        x = x + h
    return x


def process_mel(mel: jax.Array) -> jax.Array:
    """db-normalize (reference :1038-1050). mel (B, mel, T) log-amplitude."""
    amp = jnp.exp(mel.astype(jnp.float32))
    min_level = jnp.exp(-115 / 20.0 * jnp.log(10.0))
    db = 20.0 * jnp.log10(jnp.clip(amp, min_level, None)) - 20.0
    return jnp.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)


def bigvgan_forward(params: dict, cfg: BigVGANConfig, mel: jax.Array) -> jax.Array:
    """mel (B, mel_dim, T) -> waveform (B, T_wav) (reference :1052-1067)."""
    x = process_mel(mel)
    x = jnp.transpose(x, (0, 2, 1))  # NWC
    x = same_conv(x, params["conv_pre_w"], params["conv_pre_b"])

    n_res = len(cfg.resblock_kernel_sizes)
    for li, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = params["ups"][li]
        pad = (k - rate) // 2
        y = jax.lax.conv_transpose(
            x, up["w"], strides=(rate,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
        y = y + up["b"]
        x = y[:, pad: y.shape[1] - pad]
        acc = None
        for bi in range(n_res):
            rb = params["resblocks"][li * n_res + bi]
            causal_type = "1" if li > 1 else "2"
            out = amp_block(x, rb, cfg.resblock_dilation_sizes[bi], causal_type)
            acc = out if acc is None else acc + out
        x = acc / n_res

    x = aa_snake(x, params["post_act_alpha"], params["post_act_beta"])
    x = same_conv(x, params["conv_post_w"], None)
    return jnp.clip(x[..., 0], -1.0, 1.0)
