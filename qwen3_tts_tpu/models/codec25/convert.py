"""Weight conversion for the 25Hz (v1) decoder: DiT + BigVGAN."""

from __future__ import annotations

import numpy as np

from ...config import BigVGANConfig, DiTConfig
from ..speaker_encoder import convert_speaker_encoder
from .dit import dit_spk_config


def _t(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _tconv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def convert_dit(sd, cfg: DiTConfig, prefix: str = "dit.") -> dict:
    g = lambda k: np.asarray(sd[prefix + k])
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"transformer_blocks.{i}."
        layers.append({
            "attn_norm_w": _t(g(b + "attn_norm.linear.weight")),
            "attn_norm_b": g(b + "attn_norm.linear.bias"),
            "to_q_w": _t(g(b + "attn.to_q.weight")), "to_q_b": g(b + "attn.to_q.bias"),
            "to_k_w": _t(g(b + "attn.to_k.weight")), "to_k_b": g(b + "attn.to_k.bias"),
            "to_v_w": _t(g(b + "attn.to_v.weight")), "to_v_b": g(b + "attn.to_v.bias"),
            "to_out_w": _t(g(b + "attn.to_out.0.weight")),
            "to_out_b": g(b + "attn.to_out.0.bias"),
            "ff1_w": _t(g(b + "ff.ff.0.weight")), "ff1_b": g(b + "ff.ff.0.bias"),
            "ff2_w": _t(g(b + "ff.ff.3.weight")), "ff2_b": g(b + "ff.ff.3.bias"),
        })
    return {
        "time": {
            "mlp1_w": _t(g("time_embed.time_mlp.0.weight")),
            "mlp1_b": g("time_embed.time_mlp.0.bias"),
            "mlp2_w": _t(g("time_embed.time_mlp.2.weight")),
            "mlp2_b": g("time_embed.time_mlp.2.bias"),
        },
        "codec_embed": g("text_embed.codec_embed.weight"),
        "spk_encoder": convert_speaker_encoder(
            sd, dit_spk_config(cfg), prefix=prefix + "input_embed.spk_encoder."),
        "in_proj_w": _t(g("input_embed.proj.weight")),
        "in_proj_b": g("input_embed.proj.bias"),
        "layers": layers,
        "norm_out_w": _t(g("norm_out.linear.weight")),
        "norm_out_b": g("norm_out.linear.bias"),
        "proj_out_w": _t(g("proj_out.weight")),
        "proj_out_b": g("proj_out.bias"),
    }


def convert_bigvgan(sd, cfg: BigVGANConfig, prefix: str = "bigvgan.") -> dict:
    g = lambda k: np.asarray(sd[prefix + k])
    n_res = len(cfg.resblock_kernel_sizes)
    ups = []
    for i in range(len(cfg.upsample_rates)):
        ups.append({"w": _tconv(g(f"ups.{i}.0.weight")), "b": g(f"ups.{i}.0.bias")})
    resblocks = []
    for j in range(len(cfg.upsample_rates) * n_res):
        layer_idx = j // n_res
        causal_type = "1" if layer_idx > 1 else "2"
        b = f"resblocks.{j}."
        blk = {
            "convs1": [{"w": _conv(g(b + f"convs1.{k}.weight")),
                        "b": g(b + f"convs1.{k}.bias")} for k in range(3)],
            "convs2": [{"w": _conv(g(b + f"convs2.{k}.weight")),
                        "b": g(b + f"convs2.{k}.bias")} for k in range(3)],
            "acts": [{"alpha": g(b + f"activations.{m}.act.alpha"),
                      "beta": g(b + f"activations.{m}.act.beta")} for m in range(6)],
        }
        if causal_type == "2":
            blk["pre_conv_w"] = _conv(g(b + "pre_conv.weight"))
            blk["pre_conv_b"] = g(b + "pre_conv.bias")
            blk["pre_act_alpha"] = g(b + "pre_act.act.alpha")
            blk["pre_act_beta"] = g(b + "pre_act.act.beta")
        resblocks.append(blk)
    return {
        "conv_pre_w": _conv(g("conv_pre.weight")),
        "conv_pre_b": g("conv_pre.bias"),
        "ups": ups,
        "resblocks": resblocks,
        "post_act_alpha": g("activation_post.act.alpha"),
        "post_act_beta": g("activation_post.act.beta"),
        "conv_post_w": _conv(g("conv_post.weight")),
    }
