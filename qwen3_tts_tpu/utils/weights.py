"""Checkpoint conversion: HF/torch state dicts -> TPU pytrees.

Keyed by the exact parameter names of the reference checkpoints
(reference modeling_qwen3_tts.py / modeling_qwen3_tts_tokenizer_v2.py and HF
MimiModel). Linear weights are transposed to (in, out), conv weights to
(K, I, O), transposed-conv weights to (K, O, I), and per-layer tensors are
stacked on a leading L axis for the scan-compiled stacks.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import (CodecConfig, CodecDecoderConfig, MimiEncoderConfig,
                      SpeakerEncoderConfig, TalkerConfig, TTSConfig)


Array = np.ndarray
StateDict = Mapping[str, Array]


def _t(w: Array) -> Array:
    """torch Linear (out, in) -> (in, out)."""
    return np.ascontiguousarray(np.transpose(w))


def _conv(w: Array) -> Array:
    """torch Conv1d (O, I, K) -> (K, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _tconv(w: Array) -> Array:
    """torch ConvTranspose1d (I, O, K) -> (K, O, I)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def load_safetensors_dir(path: str) -> dict:
    """Load all *.safetensors in a checkpoint dir into one numpy state dict."""
    from safetensors import safe_open

    state = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.isfile(index):
        with open(index) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return state


def _stack_layers(sd: StateDict, prefix: str, n_layers: int, qk_norm: bool,
                  mlp_type: str = "swiglu", norm_type: str = "rms",
                  layer_scale: bool = False) -> dict:
    """Stack per-layer decoder weights into (L, ...) arrays."""

    def gather(fmt: str, conv: Callable[[Array], Array]):
        return np.stack([conv(np.asarray(sd[fmt.format(i=i)])) for i in range(n_layers)])

    p = {
        "q_proj": gather(prefix + "{i}.self_attn.q_proj.weight", _t),
        "k_proj": gather(prefix + "{i}.self_attn.k_proj.weight", _t),
        "v_proj": gather(prefix + "{i}.self_attn.v_proj.weight", _t),
        "o_proj": gather(prefix + "{i}.self_attn.o_proj.weight", _t),
        "input_layernorm": gather(prefix + "{i}.input_layernorm.weight", lambda x: x),
        "post_attention_layernorm": gather(
            prefix + "{i}.post_attention_layernorm.weight", lambda x: x),
    }
    if prefix + "0.self_attn.q_proj.bias" in sd:
        p["q_bias"] = gather(prefix + "{i}.self_attn.q_proj.bias", lambda x: x)
        p["k_bias"] = gather(prefix + "{i}.self_attn.k_proj.bias", lambda x: x)
        p["v_bias"] = gather(prefix + "{i}.self_attn.v_proj.bias", lambda x: x)
        p["o_bias"] = gather(prefix + "{i}.self_attn.o_proj.bias", lambda x: x)
    if qk_norm:
        p["q_norm"] = gather(prefix + "{i}.self_attn.q_norm.weight", lambda x: x)
        p["k_norm"] = gather(prefix + "{i}.self_attn.k_norm.weight", lambda x: x)
    if mlp_type == "swiglu":
        p["gate_proj"] = gather(prefix + "{i}.mlp.gate_proj.weight", _t)
        p["up_proj"] = gather(prefix + "{i}.mlp.up_proj.weight", _t)
        p["down_proj"] = gather(prefix + "{i}.mlp.down_proj.weight", _t)
    else:
        p["fc1"] = gather(prefix + "{i}.mlp.fc1.weight", _t)
        p["fc2"] = gather(prefix + "{i}.mlp.fc2.weight", _t)
    if norm_type == "layer":
        p["input_layernorm_b"] = gather(prefix + "{i}.input_layernorm.bias", lambda x: x)
        p["post_attention_layernorm_b"] = gather(
            prefix + "{i}.post_attention_layernorm.bias", lambda x: x)
    if layer_scale:
        p["attn_scale"] = gather(prefix + "{i}.self_attn_layer_scale.scale", lambda x: x)
        p["mlp_scale"] = gather(prefix + "{i}.mlp_layer_scale.scale", lambda x: x)
    return p


def convert_talker(sd: StateDict, cfg: TalkerConfig, prefix: str = "talker.") -> dict:
    """Reference Qwen3TTSTalkerForConditionalGeneration weights -> pytree
    (key space verified against the reference module's state_dict)."""
    cp = cfg.code_predictor
    n_extra = cfg.num_code_groups - 1
    g = lambda k: np.asarray(sd[prefix + k])

    layers = _stack_layers(sd, prefix + "model.layers.", cfg.num_hidden_layers, True)
    layers["norm"] = g("model.norm.weight")

    cp_layers = _stack_layers(sd, prefix + "code_predictor.model.layers.",
                              cp.num_hidden_layers, True)
    cp_layers["norm"] = g("code_predictor.model.norm.weight")

    if prefix + "code_predictor.small_to_mtp_projection.weight" in sd:
        mtp_w = _t(g("code_predictor.small_to_mtp_projection.weight"))
        mtp_b = g("code_predictor.small_to_mtp_projection.bias")
    else:  # Identity when dims match
        mtp_w = np.eye(cfg.hidden_size, dtype=np.float32)
        mtp_b = np.zeros((cfg.hidden_size,), np.float32)

    return {
        "text_embedding": g("model.text_embedding.weight"),
        "codec_embedding": g("model.codec_embedding.weight"),
        "text_projection": {
            "fc1": _t(g("text_projection.linear_fc1.weight")),
            "fc1_b": g("text_projection.linear_fc1.bias"),
            "fc2": _t(g("text_projection.linear_fc2.weight")),
            "fc2_b": g("text_projection.linear_fc2.bias"),
        },
        "layers": layers,
        "codec_head": _t(g("codec_head.weight")),
        "code_predictor": {
            "small_to_mtp": mtp_w,
            "small_to_mtp_b": mtp_b,
            "codec_embeddings": np.stack(
                [g(f"code_predictor.model.codec_embedding.{i}.weight")
                 for i in range(n_extra)]),
            "lm_heads": np.stack(
                [_t(g(f"code_predictor.lm_head.{i}.weight")) for i in range(n_extra)]),
            "layers": cp_layers,
        },
    }


def convert_codec_decoder(sd: StateDict, cfg: CodecDecoderConfig,
                          prefix: str = "decoder.") -> dict:
    """Reference Qwen3TTSTokenizerV2Decoder weights -> pytree."""
    g = lambda k: np.asarray(sd[prefix + k])

    def vq_branch(side: str, n_q: int) -> dict:
        return {
            "input_proj": _conv(g(f"quantizer.{side}.input_proj.weight"))[0],
            "output_proj": _conv(g(f"quantizer.{side}.output_proj.weight"))[0],
            "embedding_sum": np.stack(
                [g(f"quantizer.{side}.vq.layers.{i}._codebook.embedding_sum")
                 for i in range(n_q)]),
            "cluster_usage": np.stack(
                [g(f"quantizer.{side}.vq.layers.{i}._codebook.cluster_usage")
                 for i in range(n_q)]),
        }

    tr_layers = _stack_layers(sd, prefix + "pre_transformer.layers.",
                              cfg.num_hidden_layers, qk_norm=False, layer_scale=True)
    tr_layers["norm"] = g("pre_transformer.norm.weight")
    transformer = {
        "layers": tr_layers,
        "input_proj": _t(g("pre_transformer.input_proj.weight")),
        "input_proj_b": g("pre_transformer.input_proj.bias"),
        "output_proj": _t(g("pre_transformer.output_proj.weight")),
        "output_proj_b": g("pre_transformer.output_proj.bias"),
    }

    upsample = []
    for i in range(len(cfg.upsampling_ratios)):
        upsample.append({
            "tconv_w": _tconv(g(f"upsample.{i}.0.conv.weight")),
            "tconv_b": g(f"upsample.{i}.0.conv.bias"),
            "convnext": {
                "dwconv_w": _conv(g(f"upsample.{i}.1.dwconv.conv.weight")),
                "dwconv_b": g(f"upsample.{i}.1.dwconv.conv.bias"),
                "norm_w": g(f"upsample.{i}.1.norm.weight"),
                "norm_b": g(f"upsample.{i}.1.norm.bias"),
                "pw1_w": _t(g(f"upsample.{i}.1.pwconv1.weight")),
                "pw1_b": g(f"upsample.{i}.1.pwconv1.bias"),
                "pw2_w": _t(g(f"upsample.{i}.1.pwconv2.weight")),
                "pw2_b": g(f"upsample.{i}.1.pwconv2.bias"),
                "gamma": g(f"upsample.{i}.1.gamma"),
            },
        })

    blocks = []
    for bi in range(len(cfg.upsample_rates)):
        base = f"decoder.{bi + 1}.block."
        units = []
        for ui in range(3):  # dilations (1, 3, 9) at block indices 2, 3, 4
            ub = base + f"{ui + 2}."
            units.append({
                "act1_alpha": g(ub + "act1.alpha"),
                "act1_beta": g(ub + "act1.beta"),
                "conv1_w": _conv(g(ub + "conv1.conv.weight")),
                "conv1_b": g(ub + "conv1.conv.bias"),
                "act2_alpha": g(ub + "act2.alpha"),
                "act2_beta": g(ub + "act2.beta"),
                "conv2_w": _conv(g(ub + "conv2.conv.weight")),
                "conv2_b": g(ub + "conv2.conv.bias"),
            })
        blocks.append({
            "act_alpha": g(base + "0.alpha"),
            "act_beta": g(base + "0.beta"),
            "tconv_w": _tconv(g(base + "1.conv.weight")),
            "tconv_b": g(base + "1.conv.bias"),
            "units": units,
        })

    n_blocks = len(cfg.upsample_rates)
    return {
        "quantizer": {
            "semantic": vq_branch("rvq_first", 1),
            "acoustic": vq_branch("rvq_rest", cfg.num_quantizers - 1),
        },
        "pre_conv_w": _conv(g("pre_conv.conv.weight")),
        "pre_conv_b": g("pre_conv.conv.bias"),
        "transformer": transformer,
        "upsample": upsample,
        "decoder": {
            "conv_in_w": _conv(g("decoder.0.conv.weight")),
            "conv_in_b": g("decoder.0.conv.bias"),
            "blocks": blocks,
            "final_alpha": g(f"decoder.{n_blocks + 1}.alpha"),
            "final_beta": g(f"decoder.{n_blocks + 1}.beta"),
            "conv_out_w": _conv(g(f"decoder.{n_blocks + 2}.conv.weight")),
            "conv_out_b": g(f"decoder.{n_blocks + 2}.conv.bias"),
        },
    }


def convert_codec_encoder(sd: StateDict, cfg: MimiEncoderConfig,
                          prefix: str = "encoder.") -> dict:
    """HF MimiModel (encoder side) weights -> pytree.

    Layer indices inside `encoder.layers`: conv(0); per stage:
    num_residual_layers resnet blocks, ELU, downsample conv; final ELU + conv.
    """
    g = lambda k: np.asarray(sd[prefix + k])

    li = 0
    conv_in_w = _conv(g(f"encoder.layers.{li}.conv.weight"))
    conv_in_b = g(f"encoder.layers.{li}.conv.bias")
    li += 1
    stages = []
    for _ratio in reversed(cfg.upsampling_ratios):
        units = []
        for _j in range(cfg.num_residual_layers):
            base = f"encoder.layers.{li}.block."
            units.append({
                "conv1_w": _conv(g(base + "1.conv.weight")),
                "conv1_b": g(base + "1.conv.bias"),
                "conv2_w": _conv(g(base + "3.conv.weight")),
                "conv2_b": g(base + "3.conv.bias"),
            })
            li += 1
        li += 1  # ELU
        stages.append({
            "res_units": units,
            "down_w": _conv(g(f"encoder.layers.{li}.conv.weight")),
            "down_b": g(f"encoder.layers.{li}.conv.bias"),
        })
        li += 1
    li += 1  # ELU
    conv_out_w = _conv(g(f"encoder.layers.{li}.conv.weight"))
    conv_out_b = g(f"encoder.layers.{li}.conv.bias")

    tr_layers = _stack_layers(sd, prefix + "encoder_transformer.layers.",
                              cfg.num_hidden_layers, qk_norm=False,
                              mlp_type="gelu", norm_type="layer", layer_scale=True)

    def vq_branch(side: str, n_q: int) -> dict:
        b = f"quantizer.{side}_residual_vector_quantizer."
        return {
            "input_proj": _conv(g(b + "input_proj.weight"))[0],
            "output_proj": _conv(g(b + "output_proj.weight"))[0],
            "embedding_sum": np.stack(
                [g(b + f"layers.{i}.codebook.embed_sum") for i in range(n_q)]),
            "cluster_usage": np.stack(
                [g(b + f"layers.{i}.codebook.cluster_usage") for i in range(n_q)]),
        }

    n_aco = cfg.num_quantizers - cfg.num_semantic_quantizers
    return {
        "conv_in_w": conv_in_w, "conv_in_b": conv_in_b,
        "stages": stages,
        "conv_out_w": conv_out_w, "conv_out_b": conv_out_b,
        "transformer": {"layers": tr_layers},
        "downsample_w": _conv(g("downsample.conv.weight")),
        "quantizer": {
            "semantic": vq_branch("semantic", cfg.num_semantic_quantizers),
            "acoustic": vq_branch("acoustic", n_aco),
        },
    }


def to_device_dtype(pytree, dtype=jnp.bfloat16, keep_f32: tuple = ()):
    """Move a numpy pytree to device arrays with a uniform dtype.

    Norm scales / codebook stats stay float32 via the keep_f32 name match.
    """
    import jax

    def conv(path, x):
        name = "/".join(str(p) for p in path)
        if x.dtype in (np.int32, np.int64):
            return jnp.asarray(x)
        if any(k in name for k in keep_f32):
            return jnp.asarray(x, jnp.float32)
        return jnp.asarray(x, dtype)

    from jax.tree_util import tree_map_with_path

    return tree_map_with_path(lambda p, x: conv(p, x), pytree)


# ---------------------------------------------------------------------------
# inverse conversion: pytree -> HF state dict (checkpoint interchange)
# ---------------------------------------------------------------------------


def _unfuse_layers(layers: dict, cfg: TalkerConfig | None, kd: int, qd: int) -> dict:
    """Split fused qkv_proj / gate_up_proj back into HF-shaped weights."""
    out = dict(layers)
    if "qkv_proj" in out:
        qkv = np.asarray(out.pop("qkv_proj"))
        out["q_proj"] = qkv[..., :qd]
        out["k_proj"] = qkv[..., qd:qd + kd]
        out["v_proj"] = qkv[..., qd + kd:]
    if "gate_up_proj" in out:
        gu = np.asarray(out.pop("gate_up_proj"))
        half = gu.shape[-1] // 2
        out["gate_proj"] = gu[..., :half]
        out["up_proj"] = gu[..., half:]
    return out


def talker_to_state_dict(params, cfg: TalkerConfig, prefix: str = "talker.") -> dict:
    """Inverse of convert_talker: stacked pytree -> flat HF-named numpy dict,
    so finetuned models save back into reference-format checkpoints.
    Handles fused (qkv/gate_up) layouts transparently; int8-quantized params
    are not exportable (quantize after loading, not before saving)."""
    params = dict(params)
    params["layers"] = _unfuse_layers(
        params["layers"], cfg,
        cfg.num_key_value_heads * cfg.head_dim,
        cfg.num_attention_heads * cfg.head_dim)
    cp_cfg = cfg.code_predictor
    cpd = dict(params["code_predictor"])
    cpd["layers"] = _unfuse_layers(
        cpd["layers"], None,
        cp_cfg.num_key_value_heads * cp_cfg.head_dim,
        cp_cfg.num_attention_heads * cp_cfg.head_dim)
    params["code_predictor"] = cpd
    out = {}

    def un_t(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w)))

    def unstack_layers(layers: dict, base: str):
        n = layers["q_proj"].shape[0]
        for i in range(n):
            li = f"{base}{i}."
            out[li + "self_attn.q_proj.weight"] = un_t(layers["q_proj"][i])
            out[li + "self_attn.k_proj.weight"] = un_t(layers["k_proj"][i])
            out[li + "self_attn.v_proj.weight"] = un_t(layers["v_proj"][i])
            out[li + "self_attn.o_proj.weight"] = un_t(layers["o_proj"][i])
            out[li + "self_attn.q_norm.weight"] = np.asarray(layers["q_norm"][i])
            out[li + "self_attn.k_norm.weight"] = np.asarray(layers["k_norm"][i])
            out[li + "mlp.gate_proj.weight"] = un_t(layers["gate_proj"][i])
            out[li + "mlp.up_proj.weight"] = un_t(layers["up_proj"][i])
            out[li + "mlp.down_proj.weight"] = un_t(layers["down_proj"][i])
            out[li + "input_layernorm.weight"] = np.asarray(layers["input_layernorm"][i])
            out[li + "post_attention_layernorm.weight"] = np.asarray(
                layers["post_attention_layernorm"][i])

    unstack_layers(params["layers"], prefix + "model.layers.")
    out[prefix + "model.norm.weight"] = np.asarray(params["layers"]["norm"])
    out[prefix + "model.text_embedding.weight"] = np.asarray(params["text_embedding"])
    out[prefix + "model.codec_embedding.weight"] = np.asarray(params["codec_embedding"])
    tp = params["text_projection"]
    out[prefix + "text_projection.linear_fc1.weight"] = un_t(tp["fc1"])
    out[prefix + "text_projection.linear_fc1.bias"] = np.asarray(tp["fc1_b"])
    out[prefix + "text_projection.linear_fc2.weight"] = un_t(tp["fc2"])
    out[prefix + "text_projection.linear_fc2.bias"] = np.asarray(tp["fc2_b"])
    out[prefix + "codec_head.weight"] = un_t(params["codec_head"])

    cpp = params["code_predictor"]
    unstack_layers(cpp["layers"], prefix + "code_predictor.model.layers.")
    out[prefix + "code_predictor.model.norm.weight"] = np.asarray(cpp["layers"]["norm"])
    n_extra = cpp["codec_embeddings"].shape[0]
    for i in range(n_extra):
        out[prefix + f"code_predictor.model.codec_embedding.{i}.weight"] = (
            np.asarray(cpp["codec_embeddings"][i]))
        out[prefix + f"code_predictor.lm_head.{i}.weight"] = un_t(cpp["lm_heads"][i])
    if cfg.code_predictor.hidden_size != cfg.hidden_size:
        out[prefix + "code_predictor.small_to_mtp_projection.weight"] = un_t(
            cpp["small_to_mtp"])
        out[prefix + "code_predictor.small_to_mtp_projection.bias"] = np.asarray(
            cpp["small_to_mtp_b"])
    return out


def save_safetensors(state_dict: dict, path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, path)
