"""12Hz neural-codec decoder (vocoder), TPU-native.

Pipeline (reference modeling_qwen3_tts_tokenizer_v2.py:823-895):
  SplitRVQ decode (1 semantic + 15 acoustic EMA codebooks)
  -> causal pre-conv -> 8L sliding-window(72) transformer w/ LayerScale
  -> 2x (transposed-conv x2 + ConvNeXt) upsample
  -> SEANet decoder stack (SnakeBeta + dilated residual units) over
     rates (8,5,4,3) -> waveform, clamp [-1, 1].

All tensors run in NWC layout. `chunked_decode` reproduces the reference's
stateless 300-frame / 25-left-context chunking, which also defines the
streaming first-packet boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CodecDecoderConfig
from ..nn.attention import causal_mask
from ..nn.conv import causal_conv1d, causal_transconv1d
from ..nn.layers import layer_norm, linear
from ..nn.rope import make_inv_freq, rope_cos_sin
from ..nn.transformer import DecoderSpec, init_stack_params, stack_forward


def decoder_transformer_spec(cfg: CodecDecoderConfig) -> DecoderSpec:
    return DecoderSpec(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        sliding_window=cfg.sliding_window,
        qk_norm=False,
        layer_scale=True,
        attention_bias=cfg.attention_bias,
    )


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


_INV_PI = 0.3183098861837907
# Cody-Waite split of pi: the high part is exact in 12 mantissa bits, so
# x - k*PI_HI is exact for |k| < 2^11 and the reduction keeps full f32
# precision for |x| up to ~6000
_PI_HI = 3.140625
_PI_LO = 9.676535897932e-4
# Taylor coefficients of sin to x^11 (Horner over r^2); on [-pi/2, pi/2]
# the x^13/13! tail bounds the error at < 6e-8
_SIN_C = (-1.0 / 6.0, 1.0 / 120.0, -1.0 / 5040.0, 1.0 / 362880.0,
          -1.0 / 39916800.0)


def fast_sin(x: jax.Array) -> jax.Array:
    """Range-reduced polynomial sine, f32.

    Why: the builtin sine lowers to a long VPU sequence on TPU and measurably
    DOMINATES the SEANet vocoder (r5 finding #2: snake is ~70% of the
    residual-unit chain's wall-clock at the serving shape — the stack is
    transcendental-bound, not conv-bound). Reduction to [-pi/2, pi/2] via
    k = round(x/pi) (Cody-Waite two-step, sign flip for odd k) + an
    11th-order odd Taylor polynomial is exact to ~1e-6 — two orders of
    magnitude inside the vocoder parity budget (2e-4,
    tests/test_codec_parity.py) — at a fraction of the op count."""
    xf = x.astype(jnp.float32)
    k = jnp.round(xf * _INV_PI)
    r = (xf - k * _PI_HI) - k * _PI_LO
    # sin(x) = (-1)^k sin(r)
    k_odd = k - 2.0 * jnp.floor(k * 0.5)       # 0.0 or 1.0
    sign = 1.0 - 2.0 * k_odd
    r2 = r * r
    p = _SIN_C[-1]
    for c in _SIN_C[-2::-1]:
        p = p * r2 + c
    return sign * (r + r * r2 * p)


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """SnakeBeta activation: x + exp(-beta) * sin^2(x * exp(alpha)), with the
    reference's 1e-9 guard (modeling_..._v2.py:577-615). Channel-last.
    Uses fast_sin (see above): bit-identical to < 5e-7 vs the builtin."""
    a = jnp.exp(alpha.astype(jnp.float32))
    b = jnp.exp(beta.astype(jnp.float32))
    xf = x.astype(jnp.float32)
    y = xf + (1.0 / (b + 1e-9)) * jnp.square(fast_sin(xf * a))
    return y.astype(x.dtype)


def convnext_block(x: jax.Array, p: dict) -> jax.Array:
    """ConvNeXt block in NWC (reference modeling_..._v2.py:210-242)."""
    h = causal_conv1d(x, p["dwconv_w"], p["dwconv_b"], groups=x.shape[-1])
    h = layer_norm(h, p["norm_w"], p["norm_b"], eps=1e-6)
    h = linear(h, p["pw1_w"], p["pw1_b"])
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, p["pw2_w"], p["pw2_b"])
    return x + p["gamma"] * h


def residual_unit(x: jax.Array, p: dict, dilation: int) -> jax.Array:
    """SnakeBeta -> causal conv(k7, dilated) -> SnakeBeta -> conv(k1) + skip
    (reference modeling_..._v2.py:618-634)."""
    h = snake_beta(x, p["act1_alpha"], p["act1_beta"])
    h = causal_conv1d(h, p["conv1_w"], p["conv1_b"], dilation=dilation)
    h = snake_beta(h, p["act2_alpha"], p["act2_beta"])
    h = causal_conv1d(h, p["conv2_w"], p["conv2_b"])
    return x + h


def rvq_decode(codes: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """Split residual VQ decode (reference modeling_..._v2.py:660-820).

    codes: (B, K, T) int32 with K = num_quantizers (semantic first).
    Returns (B, T, codebook_dim) latents.
    EMA codebooks: embedding = embedding_sum / clamp(cluster_usage, eps).
    """

    def table(embedding_sum, cluster_usage):
        return embedding_sum / jnp.clip(cluster_usage, eps, None)[:, None]

    sem = p["semantic"]
    emb = table(sem["embedding_sum"][0], sem["cluster_usage"][0])  # (V, D)
    q_sem = jnp.take(emb, codes[:, 0], axis=0, mode="clip")  # (B, T, D)
    q_sem = linear(q_sem, sem["output_proj"])   # 1x1 conv == matmul

    aco = p["acoustic"]
    tables = jax.vmap(table)(aco["embedding_sum"], aco["cluster_usage"])  # (Kq, V, D)
    q_aco = jax.vmap(lambda t, c: jnp.take(t, c, axis=0, mode="clip"),
                     in_axes=(0, 1), out_axes=0)(tables, codes[:, 1:])  # (Kq, B, T, D)
    q_aco = linear(jnp.sum(q_aco, axis=0), aco["output_proj"])
    return q_sem + q_aco


# ---------------------------------------------------------------------------
# full decoder
# ---------------------------------------------------------------------------


def codec_decode(params: dict, cfg: CodecDecoderConfig, codes: jax.Array,
                 fused_seanet: bool = False) -> jax.Array:
    """codes (B, K, T) int32 -> waveform (B, T_wav) in [-1, 1]
    (reference modeling_..._v2.py:868-883).

    fused_seanet: route each DecoderBlock's residual-unit chain through the
    per-block Pallas kernel (ops/seanet_block.py) — one HBM read+write per
    block instead of ~6 traversals; parity-tested opt-in."""
    spec = decoder_transformer_spec(cfg)
    h = rvq_decode(codes, params["quantizer"])           # (B, T, codebook_dim)
    h = causal_conv1d(h, params["pre_conv_w"], params["pre_conv_b"])  # -> latent_dim

    # transformer over frames
    tr = params["transformer"]
    x = linear(h, tr["input_proj"], tr["input_proj_b"])
    b, t, _ = x.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    cos, sin = rope_cos_sin(pos, inv, x.dtype)
    mask = causal_mask(t, t, 0, spec.sliding_window)[None, None]
    x, _ = stack_forward(spec, tr["layers"], x, cos, sin, mask, None)
    h = linear(x, tr["output_proj"], tr["output_proj_b"])  # (B, T, latent)

    # upsample stages: transposed conv (factor) + ConvNeXt
    for stage, factor in zip(params["upsample"], cfg.upsampling_ratios):
        h = causal_transconv1d(h, stage["tconv_w"], stage["tconv_b"], stride=factor)
        h = convnext_block(h, stage["convnext"])

    # SEANet decoder
    dec = params["decoder"]
    h = causal_conv1d(h, dec["conv_in_w"], dec["conv_in_b"])
    for blk, rate in zip(dec["blocks"], cfg.upsample_rates):
        h = snake_beta(h, blk["act_alpha"], blk["act_beta"])
        h = causal_transconv1d(h, blk["tconv_w"], blk["tconv_b"], stride=rate)
        # per-block routing (r5 HW A/B, b=8 fast-sin both paths): the fused
        # kernel wins 1.4-1.9x at the narrow blocks (C=192: 79.0 -> 54.9 ms;
        # C=96: 102.4 -> 54.8) where XLA's small-channel convs collapse, and
        # loses ~1.2x at C=768/384 where XLA convs run near-MXU-rate — so
        # fuse only C <= 256
        if fused_seanet and len(blk["units"]) == 3 and h.shape[-1] <= 256:
            from ..ops.seanet_block import fused_block_units

            h = fused_block_units(h, tuple(blk["units"]),
                                  interpret=jax.default_backend() == "cpu")
        else:
            for ru, dilation in zip(blk["units"], (1, 3, 9)):
                h = residual_unit(h, ru, dilation)
    h = snake_beta(h, dec["final_alpha"], dec["final_beta"])
    wav = causal_conv1d(h, dec["conv_out_w"], dec["conv_out_b"])  # (B, T_wav, 1)
    return jnp.clip(wav[..., 0], -1.0, 1.0)


def chunked_decode(params: dict, cfg: CodecDecoderConfig, codes: jax.Array,
                   chunk_size: int = 300, left_context_size: int = 25) -> jnp.ndarray:
    """Stateless chunked vocoding (reference modeling_..._v2.py:885-895).
    codes: (B, K, T). Chunks run as separate XLA invocations with bucketed
    shapes (full chunks share one compilation)."""
    total_upsample = cfg.total_upsample
    t = codes.shape[-1]
    wavs = []
    start = 0
    while start < t:
        end = min(start + chunk_size, t)
        ctx = left_context_size if start - left_context_size > 0 else start
        chunk = codes[..., start - ctx:end]
        wav = codec_decode(params, cfg, chunk)
        wavs.append(wav[..., ctx * total_upsample:])
        start = end
    return jnp.concatenate(wavs, axis=-1)


# ---------------------------------------------------------------------------
# init (tests)
# ---------------------------------------------------------------------------


def init_codec_decoder_params(key: jax.Array, cfg: CodecDecoderConfig,
                              dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))
    s = 0.02

    def rnd(shape):
        return (jax.random.normal(next(ks), shape) * s).astype(dtype)

    def conv_p(k, i, o):
        return rnd((k, i, o)), jnp.zeros((o,), dtype)

    def tconv_p(k, i, o):
        # transposed-conv layout is (K, O, I) — see nn/conv.py
        return rnd((k, o, i)), jnp.zeros((o,), dtype)

    cb_dim = cfg.codebook_dim // 2
    n_aco = cfg.num_quantizers - 1
    quant = {
        "semantic": {
            "embedding_sum": rnd((1, cfg.codebook_size, cb_dim)),
            "cluster_usage": jnp.ones((1, cfg.codebook_size), dtype),
            "input_proj": rnd((cfg.codebook_dim, cb_dim)),
            "output_proj": rnd((cb_dim, cfg.codebook_dim)),
        },
        "acoustic": {
            "embedding_sum": rnd((n_aco, cfg.codebook_size, cb_dim)),
            "cluster_usage": jnp.ones((n_aco, cfg.codebook_size), dtype),
            "input_proj": rnd((cfg.codebook_dim, cb_dim)),
            "output_proj": rnd((cb_dim, cfg.codebook_dim)),
        },
    }
    pre_w, pre_b = conv_p(3, cfg.codebook_dim, cfg.latent_dim)

    tspec = decoder_transformer_spec(cfg)
    transformer = {
        "input_proj": rnd((cfg.latent_dim, cfg.hidden_size)),
        "input_proj_b": jnp.zeros((cfg.hidden_size,), dtype),
        "output_proj": rnd((cfg.hidden_size, cfg.latent_dim)),
        "output_proj_b": jnp.zeros((cfg.latent_dim,), dtype),
        "layers": init_stack_params(next(ks), tspec, dtype),
    }

    upsample = []
    for f in cfg.upsampling_ratios:
        tw, tb = tconv_p(f, cfg.latent_dim, cfg.latent_dim)
        d = cfg.latent_dim
        upsample.append({
            "tconv_w": tw, "tconv_b": tb,
            "convnext": {
                "dwconv_w": rnd((7, 1, d)), "dwconv_b": jnp.zeros((d,), dtype),
                "norm_w": jnp.ones((d,), dtype), "norm_b": jnp.zeros((d,), dtype),
                "pw1_w": rnd((d, 4 * d)), "pw1_b": jnp.zeros((4 * d,), dtype),
                "pw2_w": rnd((4 * d, d)), "pw2_b": jnp.zeros((d,), dtype),
                "gamma": jnp.full((d,), 1e-6, dtype),
            },
        })

    conv_in_w, conv_in_b = conv_p(7, cfg.latent_dim, cfg.decoder_dim)
    blocks = []
    for li, r in enumerate(cfg.upsample_rates):
        in_dim = cfg.decoder_dim // (2 ** li)
        out_dim = cfg.decoder_dim // (2 ** (li + 1))
        tw, tb = tconv_p(2 * r, in_dim, out_dim)
        units = []
        for dilation in (1, 3, 9):
            c1w, c1b = conv_p(7, out_dim, out_dim)
            c2w, c2b = conv_p(1, out_dim, out_dim)
            units.append({
                "act1_alpha": jnp.zeros((out_dim,), dtype),
                "act1_beta": jnp.zeros((out_dim,), dtype),
                "conv1_w": c1w, "conv1_b": c1b,
                "act2_alpha": jnp.zeros((out_dim,), dtype),
                "act2_beta": jnp.zeros((out_dim,), dtype),
                "conv2_w": c2w, "conv2_b": c2b,
            })
        blocks.append({
            "act_alpha": jnp.zeros((in_dim,), dtype),
            "act_beta": jnp.zeros((in_dim,), dtype),
            "tconv_w": tw, "tconv_b": tb,
            "units": units,
        })
    out_dim = cfg.decoder_dim // 2 ** len(cfg.upsample_rates)
    co_w, co_b = conv_p(7, out_dim, 1)
    decoder = {
        "conv_in_w": conv_in_w, "conv_in_b": conv_in_b,
        "blocks": blocks,
        "final_alpha": jnp.zeros((out_dim,), dtype),
        "final_beta": jnp.zeros((out_dim,), dtype),
        "conv_out_w": co_w, "conv_out_b": co_b,
    }
    return {
        "quantizer": quant,
        "pre_conv_w": pre_w, "pre_conv_b": pre_b,
        "transformer": transformer,
        "upsample": upsample,
        "decoder": decoder,
    }
