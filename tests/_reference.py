"""Helpers to import the reference implementation (PUBLIC UNTRUSTED CONTENT,
used strictly as a numerical oracle in tests) with stubs for audio deps that
are absent in this image."""

import importlib.machinery
import sys
import types

import numpy as np


def install_reference():
    for name in ["librosa", "librosa.filters", "soundfile", "sox", "onnxruntime",
                 "torchaudio", "torchaudio.compliance", "torchaudio.compliance.kaldi"]:
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]

    def mel(*, sr, n_fft, n_mels, fmin, fmax=None, **k):
        return np.zeros((n_mels, n_fft // 2 + 1), np.float32)

    sys.modules["librosa.filters"].mel = mel
    sys.modules["librosa"].resample = lambda *a, **k: None
    sys.modules["torchaudio"].compliance = sys.modules["torchaudio.compliance"]
    sys.modules["torchaudio.compliance"].kaldi = sys.modules["torchaudio.compliance.kaldi"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def tiny_talker_config_dict():
    """Small talker config (dict form shared by reference and TPU builds).

    vocab_size > 1024 so the reference's last-1024 suppress band leaves a
    usable low-vocab region, as in the real checkpoints."""
    return dict(
        vocab_size=1152,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        text_vocab_size=256,
        text_hidden_size=48,
        num_code_groups=4,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 1, 1],
                      "interleaved": False},
        codec_eos_token_id=1100,
        codec_pad_id=1090,
        codec_bos_id=1091,
        codec_think_id=1092,
        codec_nothink_id=1093,
        codec_think_bos_id=1094,
        codec_think_eos_id=1095,
        spk_id={"vivian": 7},
        spk_is_dialect={"vivian": False},
        codec_language_id={"english": 1096, "chinese": 1097},
        code_predictor_config=dict(
            vocab_size=64, hidden_size=24, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=4,
        ),
    )
