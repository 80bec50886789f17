"""Model configuration pytrees for the TPU-native Qwen3-TTS framework.

These mirror the on-disk ``config.json`` schema of the reference checkpoints
(reference: qwen_tts/core/models/configuration_qwen3_tts.py and
qwen_tts/core/tokenizer_12hz/configuration_qwen3_tts_tokenizer_v2.py) so the
same checkpoint files drive both frameworks, but are plain frozen dataclasses
(hashable, usable as jit static args) rather than HF PretrainedConfig objects.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Mapping


def _filter_kwargs(cls, d: Mapping[str, Any]) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def _freeze(x):
    """Recursively convert dicts/lists to hashable tuples for static-arg use."""
    if isinstance(x, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in x.items()))
    if isinstance(x, (list, tuple)):
        return tuple(_freeze(v) for v in x)
    return x


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """ECAPA-TDNN speaker encoder (reference configuration_qwen3_tts.py:22-67)."""

    mel_dim: int = 128
    enc_dim: int = 1024
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 24000

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "SpeakerEncoderConfig":
        kw = _filter_kwargs(cls, d)
        for k in ("enc_channels", "enc_kernel_sizes", "enc_dilations"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


@dataclass(frozen=True)
class CodePredictorConfig:
    """5-layer mini-decoder over the 15 residual codebooks
    (reference configuration_qwen3_tts.py:70-256)."""

    vocab_size: int = 2048
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 5
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    hidden_act: str = "silu"
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attention_bias: bool = False
    use_sliding_window: bool = False
    sliding_window: int | None = None
    num_code_groups: int = 32  # checkpoints override to 16

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CodePredictorConfig":
        kw = _filter_kwargs(cls, d)
        if not kw.get("use_sliding_window", False):
            kw["sliding_window"] = None
        return cls(**kw)


@dataclass(frozen=True)
class TalkerConfig:
    """Main codec LM ("talker"), a Qwen3-style GQA decoder
    (reference configuration_qwen3_tts.py:259-451)."""

    vocab_size: int = 3072
    hidden_size: int = 1024
    intermediate_size: int = 2048
    num_hidden_layers: int = 20
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int = 128
    hidden_act: str = "silu"
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Any = None  # frozen mapping; mrope_section etc.
    attention_bias: bool = False
    use_sliding_window: bool = False
    sliding_window: int | None = None
    num_code_groups: int = 32
    text_vocab_size: int = 151936
    text_hidden_size: int = 2048
    codec_eos_token_id: int = 4198
    codec_think_id: int = 4202
    codec_nothink_id: int = 4203
    codec_think_bos_id: int = 4204
    codec_think_eos_id: int = 4205
    codec_pad_id: int = 4196
    codec_bos_id: int = 4197
    spk_id: Any = None            # frozen mapping speaker -> codec row id
    spk_is_dialect: Any = None    # frozen mapping speaker -> False | dialect name
    codec_language_id: Any = None  # frozen mapping language -> codec id
    code_predictor: CodePredictorConfig = field(default_factory=CodePredictorConfig)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "TalkerConfig":
        kw = _filter_kwargs(cls, d)
        cp = d.get("code_predictor_config")
        if cp is not None:
            kw["code_predictor"] = CodePredictorConfig.from_dict(cp)
        for k in ("rope_scaling", "spk_id", "spk_is_dialect", "codec_language_id"):
            if kw.get(k) is not None:
                kw[k] = _freeze(kw[k])
        if "head_dim" not in kw or kw.get("head_dim") is None:
            kw["head_dim"] = kw.get("hidden_size", 1024) // kw.get("num_attention_heads", 16)
        if not kw.get("use_sliding_window", False):
            kw["sliding_window"] = None
        return cls(**kw)

    def spk_id_map(self) -> dict:
        return dict(self.spk_id) if self.spk_id else {}

    def spk_is_dialect_map(self) -> dict:
        return dict(self.spk_is_dialect) if self.spk_is_dialect else {}

    def codec_language_id_map(self) -> dict:
        return dict(self.codec_language_id) if self.codec_language_id else {}


@dataclass(frozen=True)
class TTSConfig:
    """Top-level composite config (reference configuration_qwen3_tts.py:454-500)."""

    talker: TalkerConfig = field(default_factory=TalkerConfig)
    speaker_encoder: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)
    tokenizer_type: str | None = None   # "v2_12hz" family / "v1_25hz"
    tts_model_size: str | None = None   # "0.6b" / "1.7b"
    tts_model_type: str | None = None   # "base" / "custom_voice" / "voice_design"
    im_start_token_id: int = 151644
    im_end_token_id: int = 151645
    tts_pad_token_id: int = 151671
    tts_bos_token_id: int = 151672
    tts_eos_token_id: int = 151673

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "TTSConfig":
        kw = _filter_kwargs(cls, d)
        if d.get("talker_config") is not None:
            kw["talker"] = TalkerConfig.from_dict(d["talker_config"])
        if d.get("speaker_encoder_config") is not None:
            kw["speaker_encoder"] = SpeakerEncoderConfig.from_dict(d["speaker_encoder_config"])
        return cls(**kw)

    @classmethod
    def from_json(cls, path: str) -> "TTSConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))


# ---------------------------------------------------------------------------
# 12Hz codec tokenizer configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CodecDecoderConfig:
    """Non-DiT 12Hz vocoder: RVQ decode -> sliding-window transformer ->
    upsample -> SEANet stack (reference configuration_qwen3_tts_tokenizer_v2.py:26-121)."""

    codebook_size: int = 2048
    hidden_size: int = 1024
    latent_dim: int = 1024
    max_position_embeddings: int = 8000
    rope_theta: float = 10000.0
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    attention_bias: bool = False
    sliding_window: int = 72
    intermediate_size: int = 3072
    hidden_act: str = "silu"
    layer_scale_initial_scale: float = 0.01
    rms_norm_eps: float = 1e-5
    num_hidden_layers: int = 8
    num_quantizers: int = 16
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    decoder_dim: int = 1536
    codebook_dim: int = 512  # checkpoints carry this; RVQ codebook dim = codebook_dim // 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def total_upsample(self) -> int:
        total = 1
        for r in tuple(self.upsample_rates) + tuple(self.upsampling_ratios):
            total *= r
        return total

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CodecDecoderConfig":
        kw = _filter_kwargs(cls, d)
        for k in ("upsample_rates", "upsampling_ratios"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


@dataclass(frozen=True)
class MimiEncoderConfig:
    """Subset of HF MimiConfig needed for the encode path (SEANet conv encoder +
    transformer + downsample + SplitRVQ encode). Field names follow MimiConfig."""

    sampling_rate: int = 24000
    frame_rate: float = 12.5
    audio_channels: int = 1
    hidden_size: int = 512
    num_filters: int = 64
    num_residual_layers: int = 1
    upsampling_ratios: tuple = (8, 6, 5, 4)  # encoder uses reversed order
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    trim_right_ratio: float = 1.0
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    use_conv_shortcut: bool = False
    vector_quantization_hidden_dimension: int = 256
    num_semantic_quantizers: int = 1
    # transformer part
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 250
    layer_scale_initial_scale: float = 0.01
    max_position_embeddings: int = 8000
    hidden_act: str = "gelu"

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "MimiEncoderConfig":
        kw = _filter_kwargs(cls, d)
        if "upsampling_ratios" in kw:
            kw["upsampling_ratios"] = tuple(kw["upsampling_ratios"])
        if "head_dim" not in kw or kw.get("head_dim") is None:
            kw["head_dim"] = kw.get("hidden_size", 512) // kw.get("num_attention_heads", 8)
        return cls(**kw)


@dataclass(frozen=True)
class CodecConfig:
    """Composite 12Hz codec tokenizer config
    (reference configuration_qwen3_tts_tokenizer_v2.py:124-169)."""

    encoder: MimiEncoderConfig = field(default_factory=MimiEncoderConfig)
    decoder: CodecDecoderConfig = field(default_factory=CodecDecoderConfig)
    encoder_valid_num_quantizers: int = 16
    input_sample_rate: int = 24000
    output_sample_rate: int = 24000
    decode_upsample_rate: int = 1920
    encode_downsample_rate: int = 1920
    model_type: str = "qwen3_tts_tokenizer_12hz"

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CodecConfig":
        kw = _filter_kwargs(cls, d)
        if d.get("encoder_config") is not None:
            kw["encoder"] = MimiEncoderConfig.from_dict(d["encoder_config"])
        if d.get("decoder_config") is not None:
            kw["decoder"] = CodecDecoderConfig.from_dict(d["decoder_config"])
        return cls(**kw)

    @classmethod
    def from_json(cls, path: str) -> "CodecConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))


def load_generation_defaults(model_dir: str) -> dict:
    """Load generation_config.json runtime defaults if present
    (reference modeling_qwen3_tts.py:1922-1936)."""
    path = os.path.join(model_dir, "generation_config.json")
    if os.path.isfile(path):
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    return {}


# ---------------------------------------------------------------------------
# 25Hz (v1, legacy) codec tokenizer configs
# (reference configuration_qwen3_tts_tokenizer_v1.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DiTConfig:
    """Flow-matching mel generator (22L DiT, AdaLN-Zero, block-sparse attn)."""

    hidden_size: int = 1024
    num_hidden_layers: int = 22
    num_attention_heads: int = 16
    ff_mult: int = 2
    emb_dim: int = 512
    head_dim: int = 64
    rope_theta: float = 10000.0
    block_size: int = 24
    look_ahead_layers: tuple = (10,)
    look_backward_layers: tuple = (0, 20)
    repeats: int = 2
    num_embeds: int = 8193
    mel_dim: int = 80
    # internal ECAPA speaker encoder for DiT conditioning
    enc_emb_dim: int = 192
    enc_dim: int = 128
    enc_channels: tuple = (256, 256, 256, 256, 768)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 64
    enc_res2net_scale: int = 2
    enc_se_channels: int = 64

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "DiTConfig":
        kw = _filter_kwargs(cls, d)
        for k in ("look_ahead_layers", "look_backward_layers", "enc_channels",
                  "enc_kernel_sizes", "enc_dilations"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


@dataclass(frozen=True)
class BigVGANConfig:
    mel_dim: int = 80
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: tuple = (5, 3, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (11, 7, 4, 4, 4, 4)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "BigVGANConfig":
        kw = _filter_kwargs(cls, d)
        for k in ("resblock_kernel_sizes", "upsample_rates", "upsample_kernel_sizes"):
            if k in kw:
                kw[k] = tuple(kw[k])
        if "resblock_dilation_sizes" in kw:
            kw["resblock_dilation_sizes"] = tuple(tuple(x) for x in
                                                  kw["resblock_dilation_sizes"])
        return cls(**kw)


@dataclass(frozen=True)
class WhisperVQEncoderConfig:
    """Whisper-VQ encoder with mid-stack GRVQ quantization."""

    n_mels: int = 128
    n_ctx: int = 1500
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 32
    n_window: int = 100
    output_dim: int = 3584
    audio_vq_type: str = "GRVQ"
    audio_vq_layers: int = 6
    audio_vq_codebook_size: int = 32768
    audio_vq_codebook_dim: int = 1280
    audio_vq_pe: bool = True
    audio_vq_ds_rate: int = 2

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "WhisperVQEncoderConfig":
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class CodecV1Config:
    """Composite 25Hz codec (reference configuration ...v1.py:280-324)."""

    encoder: WhisperVQEncoderConfig = field(default_factory=WhisperVQEncoderConfig)
    dit: DiTConfig = field(default_factory=DiTConfig)
    bigvgan: BigVGANConfig = field(default_factory=BigVGANConfig)
    input_sample_rate: int = 24000
    output_sample_rate: int = 24000
    decode_upsample_rate: int = 1920
    encode_downsample_rate: int = 1920
    model_type: str = "qwen3_tts_tokenizer_25hz"

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CodecV1Config":
        kw = _filter_kwargs(cls, d)
        if d.get("encoder_config") is not None:
            kw["encoder"] = WhisperVQEncoderConfig.from_dict(d["encoder_config"])
        dec = d.get("decoder_config") or {}
        if dec.get("dit_config") is not None:
            kw["dit"] = DiTConfig.from_dict(dec["dit_config"])
        if dec.get("bigvgan_config") is not None:
            kw["bigvgan"] = BigVGANConfig.from_dict(dec["bigvgan_config"])
        return cls(**kw)

    @classmethod
    def from_json(cls, path: str) -> "CodecV1Config":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))
