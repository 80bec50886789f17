"""qwen3_tts_tpu — TPU-native (JAX/XLA/Pallas) framework with the
capabilities of the Qwen3-TTS reference stack.

Layering (bottom-up):
  nn/        functional primitives (RMSNorm, RoPE, GQA attention, KV cache,
             sampling pipeline, scan-compiled decoder stacks)
  ops/       Pallas TPU kernels + DSP (mel/STFT)
  models/    talker + code predictor, 12Hz codec encoder/decoder,
             speaker encoder, generation loop
  parallel/  mesh + sharding rules (DP over utterances, TP over ICI)
  inference/ high-level Qwen3TTSModel / Qwen3TTSTokenizer APIs
"""

__version__ = "0.1.0"

from .config import (CodecConfig, CodecDecoderConfig, CodePredictorConfig,
                     MimiEncoderConfig, SpeakerEncoderConfig, TalkerConfig,
                     TTSConfig)

__all__ = [
    "CodecConfig", "CodecDecoderConfig", "CodePredictorConfig",
    "MimiEncoderConfig", "SpeakerEncoderConfig", "TalkerConfig", "TTSConfig",
    "__version__",
]

from .config import BigVGANConfig, CodecV1Config, DiTConfig, WhisperVQEncoderConfig  # noqa: E402

__all__ += ["BigVGANConfig", "CodecV1Config", "DiTConfig", "WhisperVQEncoderConfig"]


def load_model(model_dir, **kwargs):
    """Convenience: Qwen3TTSModel.from_pretrained."""
    from .inference.tts_model import Qwen3TTSModel

    return Qwen3TTSModel.from_pretrained(model_dir, **kwargs)
