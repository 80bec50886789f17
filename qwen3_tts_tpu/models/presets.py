"""Model-size presets matching the reference checkpoint family
(README.md:68-79: 12Hz 0.6B / 1.7B talkers + 12Hz codec).

# =========================================================================
# INVENTED — replace with the released config.json on weights-day.
#
# The speaker ids (_SPK), language ids (_LANG), and the exact 0.6B/1.7B
# decoder dims below are GUESSES made without checkpoint access (zero
# egress): real id maps live in the checkpoint's config.json (reference
# configuration_qwen3_tts.py:393-402) and always win at load time
# (TTSConfig.from_dict). These presets exist ONLY so benchmarks and
# profiling tools have a production-geometry model to measure; every perf
# number keyed to them (bench.py headline, kernel tile plans) must be
# re-validated against the released config on weights-day — run_baseline's
# report carries a weights_day_checklist row for exactly this.
# =========================================================================
"""

from __future__ import annotations

import warnings

from ..config import (CodecConfig, CodecDecoderConfig, CodePredictorConfig,
                      MimiEncoderConfig, TalkerConfig, TTSConfig)

_CODE_PREDICTOR = dict(
    vocab_size=2048, hidden_size=1024, intermediate_size=3072,
    num_hidden_layers=5, num_attention_heads=16, num_key_value_heads=8,
    head_dim=128, num_code_groups=16,
)

# INVENTED ids (see module banner): config.json wins whenever a real
# checkpoint is loaded; these only shape bench/profiling geometry.
_SPK = {"vivian": 3000}
_SPK_DIALECT = {"vivian": False}
_LANG = {"english": 4206, "chinese": 4207}

_warned = False


def _warn_invented() -> None:
    """One warning per process when a preset (not a real config.json)
    provides model geometry / id maps."""
    global _warned
    if not _warned:
        _warned = True
        warnings.warn(
            "qwen3_tts_tpu.models.presets: using INVENTED model dims / "
            "speaker+language ids (no released checkpoint in this "
            "environment). Load a real config.json for production use; "
            "re-validate bench geometry on weights-day.", stacklevel=3)


def talker_1p7b() -> TalkerConfig:
    """1.7B-class talker (Qwen3-1.7B decoder dims + codec heads)."""
    _warn_invented()
    return TalkerConfig.from_dict(dict(
        vocab_size=5120, hidden_size=2048, intermediate_size=6144,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, text_vocab_size=151936, text_hidden_size=2048,
        num_code_groups=16,
        rope_scaling={"rope_type": "default", "mrope_section": [24, 20, 20],
                      "interleaved": False},
        spk_id=_SPK, spk_is_dialect=_SPK_DIALECT, codec_language_id=_LANG,
        code_predictor_config=_CODE_PREDICTOR,
    ))


def talker_0p6b() -> TalkerConfig:
    """0.6B-class talker (Qwen3-0.6B decoder dims)."""
    _warn_invented()
    return TalkerConfig.from_dict(dict(
        vocab_size=5120, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, text_vocab_size=151936, text_hidden_size=1024,
        num_code_groups=16,
        rope_scaling={"rope_type": "default", "mrope_section": [24, 20, 20],
                      "interleaved": False},
        spk_id=_SPK, spk_is_dialect=_SPK_DIALECT, codec_language_id=_LANG,
        code_predictor_config=_CODE_PREDICTOR,
    ))


def tiny_talker() -> TalkerConfig:
    """Small config for tests / dryruns."""
    return TalkerConfig.from_dict(dict(
        vocab_size=1152, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, text_vocab_size=256, text_hidden_size=48, num_code_groups=4,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 1, 1],
                      "interleaved": False},
        codec_eos_token_id=1100, codec_pad_id=1090, codec_bos_id=1091,
        codec_think_id=1092, codec_nothink_id=1093, codec_think_bos_id=1094,
        codec_think_eos_id=1095,
        spk_id={"vivian": 7}, spk_is_dialect={"vivian": False},
        codec_language_id={"english": 1096, "chinese": 1097},
        code_predictor_config=dict(
            vocab_size=64, hidden_size=24, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=4),
    ))


def codec_12hz() -> CodecConfig:
    """Production 12Hz codec (config v2 defaults + checkpoint codebook_dim)."""
    return CodecConfig(
        encoder=MimiEncoderConfig(),
        decoder=CodecDecoderConfig(),
    )


def tts_config(size: str = "1.7b", model_type: str = "custom_voice") -> TTSConfig:
    talker = talker_1p7b() if size == "1.7b" else talker_0p6b()
    return TTSConfig(talker=talker, tokenizer_type="qwen3_tts_tokenizer_12hz",
                     tts_model_size=size, tts_model_type=model_type)
