"""25Hz legacy decoder stage 1: DiT flow-matching mel generator.

Reference Qwen3TTSTokenizerV1DecoderDiTModel (modeling_..._v1.py:1071-1226):
22L DiT with AdaLayerNormZero conditioning on the flow timestep,
block-sparse attention (24-frame blocks; look-ahead on layer 10,
look-backward on layers 0/20), interleaved-pair RoPE, classifier-free
guidance with batch doubling, and a 10-step Euler ODE with sway-shifted
timesteps. All math fp32 (the reference forces fp32 inference for this
stage).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...config import DiTConfig
from ...nn.layers import layer_norm, linear
from ..speaker_encoder import speaker_encode
from ...config import SpeakerEncoderConfig


def dit_spk_config(cfg: DiTConfig) -> SpeakerEncoderConfig:
    """The DiT's internal ECAPA conditioner reuses the generic speaker
    encoder graph with its own dims (reference :342-423)."""
    return SpeakerEncoderConfig(
        mel_dim=cfg.mel_dim, enc_dim=cfg.enc_dim, enc_channels=cfg.enc_channels,
        enc_kernel_sizes=cfg.enc_kernel_sizes, enc_dilations=cfg.enc_dilations,
        enc_attention_channels=cfg.enc_attention_channels,
        enc_res2net_scale=cfg.enc_res2net_scale, enc_se_channels=cfg.enc_se_channels)


def rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """Pairwise rotate: (d r)->r=2 pairs (reference rotate_half_codec :556-561)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def dit_rope_tables(seq_len: int, head_dim: int, theta: float = 10000.0):
    """Interleaved cos/sin (f0,f0,f1,f1,...) (reference :99-121)."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * inv[None, :]
    freqs = jnp.stack([freqs, freqs], axis=-1).reshape(seq_len, head_dim)
    return jnp.cos(freqs), jnp.sin(freqs)


def timestep_embedding(t: jax.Array, p: dict, freq_dim: int = 256) -> jax.Array:
    """Sinusoidal timestep embed + 2-layer SiLU MLP (reference :634-660)."""
    half = freq_dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    arg = 1000.0 * t[:, None] * freqs[None, :]
    te = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)
    h = jax.nn.silu(linear(te, p["mlp1_w"], p["mlp1_b"]))
    return linear(h, p["mlp2_w"], p["mlp2_b"])


def _ada_ln_zero(x, emb, p, name):
    e = linear(jax.nn.silu(emb), p[name + "_w"], p[name + "_b"])
    return e


def _ln_no_affine(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def dit_layer(x: jax.Array, t_emb: jax.Array, p: dict, cfg: DiTConfig,
              cos, sin, block_mask: jax.Array) -> jax.Array:
    """One DiT block (reference DiTDecoderLayer :663-695)."""
    mod = _ada_ln_zero(x, t_emb, p, "attn_norm")  # (B, 6H)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    h = _ln_no_affine(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]

    b, t, _ = h.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    q = linear(h, p["to_q_w"], p["to_q_b"]).reshape(b, t, nh, hd)
    k = linear(h, p["to_k_w"], p["to_k_b"]).reshape(b, t, nh, hd)
    v = linear(h, p["to_v_w"], p["to_v_b"]).reshape(b, t, nh, hd)
    cos_b = cos[None, :, None, :]
    sin_b = sin[None, :, None, :]
    q = q * cos_b + rotate_half_interleaved(q) * sin_b
    k = k * cos_b + rotate_half_interleaved(k) * sin_b

    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    scores = jnp.where(block_mask[None, None], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, nh * hd)
    attn = linear(attn, p["to_out_w"], p["to_out_b"])
    x = x + gate_msa[:, None] * attn

    h = _ln_no_affine(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    h = jax.nn.gelu(linear(h, p["ff1_w"], p["ff1_b"]), approximate=True)
    h = linear(h, p["ff2_w"], p["ff2_b"])
    return x + gate_mlp[:, None] * h


def block_diff_matrix(seq_len: int, block_size: int) -> jax.Array:
    blocks = jnp.arange(seq_len) // block_size
    return blocks[None, :] - blocks[:, None]  # (t, t): block_j - block_i


def dit_forward(params: dict, cfg: DiTConfig, x: jax.Array, ref_mel: jax.Array,
                xvector: jax.Array, code: jax.Array, t: jax.Array,
                apply_cfg: bool = True) -> jax.Array:
    """One vector-field evaluation (reference DiT forward :1114-1160).

    x: (B, T, mel); ref_mel: (B, T_ref, mel); xvector: (B, T, enc_emb_dim)
    already repeated over time; code: (B, T_code) int; t: scalar or (B,).
    """
    b = x.shape[0]
    if apply_cfg:
        bsz = 2 * b
    else:
        bsz = b
    tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (bsz,))
    t_emb = timestep_embedding(tt, params["time"])

    code_embed = jnp.take(params["codec_embed"], code, axis=0)  # (B, Tc, emb)
    code_embed = jnp.repeat(code_embed, cfg.repeats, axis=1)
    if apply_cfg:
        code_uncond = jnp.broadcast_to(params["codec_embed"][0][None, None],
                                       code_embed.shape)
        x = jnp.concatenate([x, x], axis=0)
        xvector = jnp.concatenate([xvector, jnp.zeros_like(xvector)], axis=0)
        ref_mel = jnp.concatenate([ref_mel, jnp.zeros_like(ref_mel)], axis=0)
        code_embed = jnp.concatenate([code_embed, code_uncond], axis=0)

    spk = speaker_encode(params["spk_encoder"], dit_spk_config(cfg), ref_mel)
    spk = jnp.broadcast_to(spk[:, None, :], (bsz, x.shape[1], cfg.enc_dim))
    h = jnp.concatenate([x, spk, code_embed, xvector], axis=-1)
    h = linear(h, params["in_proj_w"], params["in_proj_b"])

    t_len = h.shape[1]
    cos, sin = dit_rope_tables(t_len, cfg.head_dim, cfg.rope_theta)
    bdiff = block_diff_matrix(t_len, cfg.block_size)

    for i, lp in enumerate(params["layers"]):
        ahead = 1 if i in cfg.look_ahead_layers else 0
        back = 1 if i in cfg.look_backward_layers else 0
        mask = (bdiff >= -back) & (bdiff <= ahead)
        h = dit_layer(h, t_emb, lp, cfg, cos, sin, mask)

    mod = _ada_ln_zero(h, t_emb, params, "norm_out")
    scale, shift = jnp.split(mod, 2, axis=-1)
    h = _ln_no_affine(h) * (1 + scale)[:, None] + shift[:, None]
    return linear(h, params["proj_out_w"], params["proj_out_b"])


def dit_sample(params: dict, cfg: DiTConfig, code: jax.Array, ref_mel: jax.Array,
               xvector: jax.Array, key: jax.Array, num_steps: int = 10,
               guidance_scale: float = 0.5, sway_coefficient: float = -1.0) -> jax.Array:
    """CFG Euler ODE with sway sampling (reference sample :1171-1226).
    Returns mel (B, mel_dim, T_mel)."""
    b, t_code = code.shape
    t_mel = t_code * cfg.repeats
    x = jax.random.normal(key, (b, t_mel, cfg.mel_dim), jnp.float32)
    xv = jnp.broadcast_to(xvector[:, None, :], (b, t_mel, cfg.enc_emb_dim))

    ts = jnp.linspace(0.0, 1.0, num_steps)
    if sway_coefficient is not None:
        ts = ts + sway_coefficient * (jnp.cos(jnp.pi / 2 * ts) - 1 + ts)

    def vector_field(t, x):
        if guidance_scale < 1e-5:
            return dit_forward(params, cfg, x, ref_mel, xv, code, t, apply_cfg=False)
        out = dit_forward(params, cfg, x, ref_mel, xv, code, t, apply_cfg=True)
        cond, uncond = jnp.split(out, 2, axis=0)
        return cond + (cond - uncond) * guidance_scale

    def step(x, i):
        t0, t1 = ts[i], ts[i + 1]
        x = x + vector_field(t0, x) * (t1 - t0)
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(num_steps - 1))
    return jnp.transpose(x, (0, 2, 1))


def init_dit_params(key: jax.Array, cfg: DiTConfig) -> dict:
    from ..speaker_encoder import convert_speaker_encoder  # noqa: F401
    ks = iter(jax.random.split(key, 512))
    s = 0.02
    rnd = lambda shape: jax.random.normal(next(ks), shape) * s
    h = cfg.hidden_size
    in_dim = cfg.mel_dim + cfg.enc_dim + cfg.enc_emb_dim + cfg.emb_dim

    def lin(i, o):
        return rnd((i, o)), jnp.zeros((o,))

    layers = []
    for _ in range(cfg.num_hidden_layers):
        inner = cfg.hidden_size * cfg.ff_mult
        lp = {}
        lp["attn_norm_w"], lp["attn_norm_b"] = lin(h, 6 * h)
        lp["to_q_w"], lp["to_q_b"] = lin(h, cfg.num_attention_heads * cfg.head_dim)
        lp["to_k_w"], lp["to_k_b"] = lin(h, cfg.num_attention_heads * cfg.head_dim)
        lp["to_v_w"], lp["to_v_b"] = lin(h, cfg.num_attention_heads * cfg.head_dim)
        lp["to_out_w"], lp["to_out_b"] = lin(cfg.num_attention_heads * cfg.head_dim, h)
        lp["ff1_w"], lp["ff1_b"] = lin(h, inner)
        lp["ff2_w"], lp["ff2_b"] = lin(inner, h)
        layers.append(lp)

    # internal ECAPA init via the generic speaker-encoder converter shape:
    # build torch-free random params with the same tree as convert_speaker_encoder
    from ...config import SpeakerEncoderConfig as SEC

    def ecapa_init(scfg: SEC):
        def tdnn(i, o, k):
            return {"w": rnd((k, i, o)), "b": jnp.zeros((o,))}
        blocks = [tdnn(scfg.mel_dim, scfg.enc_channels[0], scfg.enc_kernel_sizes[0])]
        for bi in range(1, len(scfg.enc_channels) - 1):
            c = scfg.enc_channels[bi]
            blocks.append({
                "tdnn1": tdnn(scfg.enc_channels[bi - 1], c, 1),
                "res2net": {"blocks": [tdnn(c // scfg.enc_res2net_scale,
                                            c // scfg.enc_res2net_scale,
                                            scfg.enc_kernel_sizes[bi])
                                       for _ in range(scfg.enc_res2net_scale - 1)]},
                "tdnn2": tdnn(c, c, 1),
                "se": {"conv1_w": rnd((1, c, scfg.enc_se_channels)),
                       "conv1_b": jnp.zeros((scfg.enc_se_channels,)),
                       "conv2_w": rnd((1, scfg.enc_se_channels, c)),
                       "conv2_b": jnp.zeros((c,))},
            })
        last = scfg.enc_channels[-1]
        return {
            "blocks": blocks,
            "mfa": tdnn(last, last, scfg.enc_kernel_sizes[-1]),
            "asp": {"tdnn": tdnn(last * 3, scfg.enc_attention_channels, 1),
                    "conv_w": rnd((1, scfg.enc_attention_channels, last)),
                    "conv_b": jnp.zeros((last,))},
            "fc_w": rnd((1, last * 2, scfg.enc_dim)),
            "fc_b": jnp.zeros((scfg.enc_dim,)),
        }

    time_p = {"mlp1_w": rnd((256, h)), "mlp1_b": jnp.zeros((h,)),
              "mlp2_w": rnd((h, h)), "mlp2_b": jnp.zeros((h,))}
    p = {
        "time": time_p,
        "codec_embed": rnd((cfg.num_embeds + 1, cfg.emb_dim)),
        "spk_encoder": ecapa_init(dit_spk_config(cfg)),
        "in_proj_w": rnd((in_dim, h)), "in_proj_b": jnp.zeros((h,)),
        "layers": layers,
        "norm_out_w": rnd((h, 2 * h)), "norm_out_b": jnp.zeros((2 * h,)),
        "proj_out_w": rnd((h, cfg.mel_dim)), "proj_out_b": jnp.zeros((cfg.mel_dim,)),
    }
    return p
