"""Build a tiny reference-format checkpoint directory on disk for API tests."""

import json
import os

import numpy as np
import torch

from _reference import install_reference, tiny_talker_config_dict

install_reference()


class StubProcessor:
    """Tokenizer where the chat-template specials are single tokens, so the
    role head is exactly 3 tokens and the tail exactly 5 (as with Qwen2)."""

    SPECIALS = {"<|im_start|>": 1, "<|im_end|>": 2, "assistant": 5, "user": 8, "\n": 6}

    def __call__(self, text):
        ids = []
        i = 0
        while i < len(text):
            for tok, tid in self.SPECIALS.items():
                if text.startswith(tok, i):
                    ids.append(tid)
                    i += len(tok)
                    break
            else:
                ids.append(ord(text[i]) % 180 + 20)
                i += 1
        return {"input_ids": ids}


MIMI_TINY = dict(
    sampling_rate=24000, frame_rate=12.5, audio_channels=1,
    hidden_size=16, num_filters=4, num_residual_layers=1,
    upsampling_ratios=[8, 6, 5, 4], kernel_size=7, last_kernel_size=3,
    residual_kernel_size=3, dilation_growth_rate=2, compress=2,
    codebook_size=32, codebook_dim=8, num_quantizers=6,
    vector_quantization_hidden_dimension=8, num_semantic_quantizers=1,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    head_dim=8, intermediate_size=32, norm_eps=1e-5, sliding_window=20,
    layer_scale_initial_scale=0.01, use_causal_conv=True, upsample_groups=16,
)

DEC_TINY = dict(
    codebook_size=32, hidden_size=32, latent_dim=16, max_position_embeddings=512,
    num_attention_heads=4, num_key_value_heads=4, sliding_window=8,
    intermediate_size=64, layer_scale_initial_scale=0.01, rms_norm_eps=1e-5,
    num_hidden_layers=2, num_quantizers=4, upsample_rates=[2, 2],
    upsampling_ratios=[2], decoder_dim=32, codebook_dim=16,
)


def _save_safetensors(sd: dict, path: str):
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()}, path)


def _randomized_state(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    new = {}
    for k, v in module.state_dict().items():
        if v.dtype.is_floating_point:
            t = torch.randn(v.shape, generator=g) * 0.05
            if "cluster_usage" in k:
                t = torch.rand(v.shape, generator=g) * 2 + 0.5
        else:
            t = v
        new[k] = t
    module.load_state_dict(new)
    return new


def build_checkpoint(tmpdir: str, model_type: str = "custom_voice") -> str:
    """Create {tmpdir}/model with config.json, model.safetensors,
    generation_config.json and speech_tokenizer/."""
    from qwen_tts.core.models.configuration_qwen3_tts import Qwen3TTSConfig
    from qwen_tts.core.models.modeling_qwen3_tts import (
        Qwen3TTSForConditionalGeneration)
    from transformers import MimiConfig, MimiModel
    from qwen_tts.core.tokenizer_12hz.configuration_qwen3_tts_tokenizer_v2 import (
        Qwen3TTSTokenizerV2DecoderConfig)
    from qwen_tts.core.tokenizer_12hz.modeling_qwen3_tts_tokenizer_v2 import (
        Qwen3TTSTokenizerV2Decoder)

    model_dir = os.path.join(tmpdir, "model")
    os.makedirs(model_dir, exist_ok=True)

    talker_d = tiny_talker_config_dict()
    cfg = Qwen3TTSConfig(
        talker_config=talker_d,
        speaker_encoder_config=dict(
            mel_dim=16, enc_dim=talker_d["hidden_size"],
            enc_channels=[24, 24, 24, 24, 72], enc_kernel_sizes=[5, 3, 3, 3, 1],
            enc_dilations=[1, 2, 3, 4, 1], enc_attention_channels=8,
            enc_res2net_scale=4, enc_se_channels=8),
        tts_model_type=model_type, tts_model_size="tiny",
        tokenizer_type="qwen3_tts_tokenizer_12hz",
        im_start_token_id=1, im_end_token_id=2,
        tts_pad_token_id=100, tts_bos_token_id=101, tts_eos_token_id=102)
    torch.manual_seed(0)
    full = Qwen3TTSForConditionalGeneration(cfg).eval().float()
    sd = full.state_dict()
    _save_safetensors(sd, os.path.join(model_dir, "model.safetensors"))
    cfg_dict = json.loads(cfg.to_json_string())
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg_dict, f)
    with open(os.path.join(model_dir, "generation_config.json"), "w") as f:
        json.dump({"do_sample": True, "top_k": 10, "max_new_tokens": 16}, f)

    # --- speech tokenizer subdir ---
    st_dir = os.path.join(model_dir, "speech_tokenizer")
    os.makedirs(st_dir, exist_ok=True)
    mimi = MimiModel(MimiConfig(**{**MIMI_TINY, "attn_implementation": "eager"})).eval()
    _randomized_state(mimi, seed=3)
    dec = Qwen3TTSTokenizerV2Decoder._from_config(
        Qwen3TTSTokenizerV2DecoderConfig(**{**DEC_TINY, "attn_implementation": "eager"})).eval()
    _randomized_state(dec, seed=4)
    st_sd = {}
    for k, v in mimi.state_dict().items():
        st_sd["encoder." + k] = v
    for k, v in dec.state_dict().items():
        st_sd["decoder." + k] = v
    _save_safetensors(st_sd, os.path.join(st_dir, "model.safetensors"))
    with open(os.path.join(st_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen3_tts_tokenizer_12hz",
            "encoder_config": MIMI_TINY, "decoder_config": DEC_TINY,
            "encoder_valid_num_quantizers": 4,
            "input_sample_rate": 24000, "output_sample_rate": 24000,
            "decode_upsample_rate": 8, "encode_downsample_rate": 1920,
        }, f)
    return model_dir
