"""12Hz neural-codec encoder (Mimi lineage), TPU-native.

wave -> SEANet conv encoder (ELU + strided causal convs over reversed ratios)
     -> 8L transformer (LayerNorm + GELU MLP + LayerScale, sliding window 250)
     -> 2x causal downsample conv (replicate padding)
     -> SplitRVQ *encode* (argmin over EMA codebooks; 1 semantic + residual
        acoustic chain) -> (B, K, T) codes.

Reference behavior: HF MimiModel._encode_frame wrapped by
Qwen3TTSTokenizerV2Encoder (reference modeling_qwen3_tts_tokenizer_v2.py:
898-990); only the first `encoder_valid_num_quantizers` codes are kept, so we
run exactly that many acoustic quantizers (the residual chain makes later
quantizers irrelevant to earlier codes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MimiEncoderConfig
from ..nn.attention import causal_mask
from ..nn.conv import conv1d
from ..nn.rope import make_inv_freq, rope_cos_sin
from ..nn.transformer import DecoderSpec, init_stack_params, stack_forward


def encoder_transformer_spec(cfg: MimiEncoderConfig) -> DecoderSpec:
    return DecoderSpec(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta,
        sliding_window=cfg.sliding_window,
        qk_norm=False,
        layer_scale=True,
        attention_bias=False,
        norm_type="layer",
        mlp_type="gelu",
        final_norm=False,
    )


def _mimi_causal_pad(x: jax.Array, k: int, stride: int, dilation: int,
                     mode: str) -> jax.Array:
    """Mimi causal padding: left = K_eff - stride, right = extra to cover the
    strided output (HF MimiConv1d semantics)."""
    import math

    k_eff = (k - 1) * dilation + 1
    pad_total = k_eff - stride
    length = x.shape[1]
    n_frames = math.ceil((length - k_eff + pad_total) / stride + 1) - 1
    ideal = n_frames * stride + k_eff - pad_total
    extra = max(ideal - length, 0)
    if mode == "replicate":
        return jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode="edge")
    return jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)))


def mimi_conv(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
              stride: int = 1, dilation: int = 1, mode: str = "constant") -> jax.Array:
    x = _mimi_causal_pad(x, w.shape[0], stride, dilation, mode)
    return conv1d(x, w, b, stride=stride, dilation=dilation)


def seanet_encode(params: dict, cfg: MimiEncoderConfig, wav: jax.Array) -> jax.Array:
    """wav (B, T, 1) -> (B, T_frames25, hidden)."""
    h = mimi_conv(wav, params["conv_in_w"], params["conv_in_b"])
    for stage, ratio in zip(params["stages"], tuple(reversed(cfg.upsampling_ratios))):
        for j, unit in enumerate(stage["res_units"]):
            r = jax.nn.elu(h)
            r = mimi_conv(r, unit["conv1_w"], unit["conv1_b"],
                          dilation=cfg.dilation_growth_rate ** j)
            r = jax.nn.elu(r)
            r = mimi_conv(r, unit["conv2_w"], unit["conv2_b"])
            h = h + r
        h = jax.nn.elu(h)
        h = mimi_conv(h, stage["down_w"], stage["down_b"], stride=ratio)
    h = jax.nn.elu(h)
    return mimi_conv(h, params["conv_out_w"], params["conv_out_b"])


def rvq_encode(params: dict, embeddings: jax.Array, num_acoustic: int) -> jax.Array:
    """SplitRVQ encode. embeddings (B, T, D_hidden) -> codes (B, K, T)."""

    def table(embedding_sum, cluster_usage, eps=1e-5):
        return embedding_sum / jnp.clip(cluster_usage, eps, None)[:, None]

    def nearest(x, emb):
        # x (B,T,D) fp32; emb (V,D) fp32; returns argmin_j ||x - e_j||
        x32, e32 = x.astype(jnp.float32), emb.astype(jnp.float32)
        dots = jnp.einsum("btd,vd->btv", x32, e32)
        e_sq = jnp.sum(jnp.square(e32), axis=-1)
        # ||x||^2 constant over v — omit for argmin
        return jnp.argmin(e_sq[None, None] - 2.0 * dots, axis=-1).astype(jnp.int32)

    sem, aco = params["semantic"], params["acoustic"]
    x_sem = jnp.einsum("btd,dc->btc", embeddings, sem["input_proj"])
    emb_sem = table(sem["embedding_sum"][0], sem["cluster_usage"][0])
    codes = [nearest(x_sem, emb_sem)]

    residual = jnp.einsum("btd,dc->btc", embeddings, aco["input_proj"])
    for i in range(num_acoustic):
        emb_i = table(aco["embedding_sum"][i], aco["cluster_usage"][i])
        idx = nearest(residual, emb_i)
        codes.append(idx)
        residual = residual - jnp.take(emb_i, idx, axis=0, mode="clip")
    return jnp.stack(codes, axis=1)  # (B, K, T)


def codec_encode(params: dict, cfg: MimiEncoderConfig, wav: jax.Array,
                 num_quantizers: int = 16) -> jax.Array:
    """wav (B, T) float -> codes (B, num_quantizers, T_frames) int32."""
    spec = encoder_transformer_spec(cfg)
    h = seanet_encode(params, cfg, wav[..., None])

    b, t, _ = h.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    cos, sin = rope_cos_sin(pos, inv, h.dtype)
    mask = causal_mask(t, t, 0, spec.sliding_window)[None, None]
    h, _ = stack_forward(spec, params["transformer"]["layers"], h, cos, sin, mask, None)

    h = mimi_conv(h, params["downsample_w"], None, stride=2, mode="replicate")
    return rvq_encode(params["quantizer"], h, num_quantizers - 1)


def init_codec_encoder_params(key: jax.Array, cfg: MimiEncoderConfig,
                              dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))
    s = 0.02

    def rnd(shape):
        return (jax.random.normal(next(ks), shape) * s).astype(dtype)

    def conv_p(k, i, o, bias=True):
        return rnd((k, i, o)), (jnp.zeros((o,), dtype) if bias else None)

    nf = cfg.num_filters
    conv_in_w, conv_in_b = conv_p(cfg.kernel_size, cfg.audio_channels, nf)
    stages = []
    ch = nf
    for ratio in reversed(cfg.upsampling_ratios):
        units = []
        for j in range(cfg.num_residual_layers):
            hidden = ch // cfg.compress
            c1w, c1b = conv_p(cfg.residual_kernel_size, ch, hidden)
            c2w, c2b = conv_p(1, hidden, ch)
            units.append({"conv1_w": c1w, "conv1_b": c1b,
                          "conv2_w": c2w, "conv2_b": c2b})
        dw, db = conv_p(2 * ratio, ch, ch * 2)
        stages.append({"res_units": units, "down_w": dw, "down_b": db})
        ch *= 2
    conv_out_w, conv_out_b = conv_p(cfg.last_kernel_size, ch, cfg.hidden_size)

    spec = encoder_transformer_spec(cfg)
    vq_dim = cfg.vector_quantization_hidden_dimension
    n_aco = cfg.num_quantizers - cfg.num_semantic_quantizers
    return {
        "conv_in_w": conv_in_w, "conv_in_b": conv_in_b,
        "stages": stages,
        "conv_out_w": conv_out_w, "conv_out_b": conv_out_b,
        "transformer": {"layers": init_stack_params(next(ks), spec, dtype)},
        "downsample_w": rnd((4, cfg.hidden_size, cfg.hidden_size)),
        "quantizer": {
            "semantic": {
                "input_proj": rnd((cfg.hidden_size, vq_dim)),
                "output_proj": rnd((vq_dim, cfg.hidden_size)),
                "embedding_sum": rnd((1, cfg.codebook_size, vq_dim)),
                "cluster_usage": jnp.ones((1, cfg.codebook_size), dtype),
            },
            "acoustic": {
                "input_proj": rnd((cfg.hidden_size, vq_dim)),
                "output_proj": rnd((vq_dim, cfg.hidden_size)),
                "embedding_sum": rnd((n_aco, cfg.codebook_size, vq_dim)),
                "cluster_usage": jnp.ones((n_aco, cfg.codebook_size), dtype),
            },
        },
    }
