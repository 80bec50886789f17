"""25Hz encoder parity: whisper log-mel + WhisperEncoderVQ codes vs reference."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _reference import install_reference

install_reference()

from qwen3_tts_tpu.config import WhisperVQEncoderConfig
from qwen3_tts_tpu.models.codec25.whisper_vq import (convert_whisper_vq,
                                                     get_T_after_cnn,
                                                     whisper_log_mel,
                                                     whisper_vq_encode)

ENC_CFG = dict(
    n_mels=24, n_ctx=400, n_state=32, n_head=4, n_layer=4, n_window=16,
    output_dim=48, audio_vq_type="GRVQ", audio_vq_layers=2,
    audio_vq_codebook_size=64, audio_vq_codebook_dim=32, audio_vq_pe=True,
    audio_vq_ds_rate=2,
)


def _patch_mel_filters():
    """Route the reference's mel_filters stub to real filterbank values so
    its log_mel matches ours (librosa absent; our filterbank reproduces it)."""
    import qwen_tts.core.tokenizer_25hz.vq.whisper_encoder as we

    from qwen3_tts_tpu.ops.mel import mel_filterbank

    def mel_filters(device, n_mels):
        return torch.from_numpy(np.array(mel_filterbank(16000, 400, n_mels)))

    we.mel_filters = mel_filters


def test_whisper_log_mel_parity():
    _patch_mel_filters()
    import qwen_tts.core.tokenizer_25hz.vq.whisper_encoder as we

    rng = np.random.RandomState(0)
    audio = (rng.randn(16000) * 0.2).astype(np.float32)
    want = we.log_mel_spectrogram(audio, n_mels=128, padding=240).numpy()
    got = whisper_log_mel(audio, n_mels=128, padding=240)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_whisper_vq_codes_parity():
    _patch_mel_filters()
    from qwen_tts.core.tokenizer_25hz.vq.speech_vq import WhisperEncoderVQ

    torch.manual_seed(0)
    ref = WhisperEncoderVQ(
        n_mels=ENC_CFG["n_mels"], n_ctx=ENC_CFG["n_ctx"], n_state=ENC_CFG["n_state"],
        n_head=ENC_CFG["n_head"], n_layer=ENC_CFG["n_layer"],
        n_window=ENC_CFG["n_window"], output_dim=ENC_CFG["output_dim"],
        audio_vq_layers=ENC_CFG["audio_vq_layers"], audio_vq_type="GRVQ",
        audio_vq_codebook_size=ENC_CFG["audio_vq_codebook_size"],
        audio_vq_pe=True, audio_vq_codebook_dim=ENC_CFG["audio_vq_codebook_dim"],
        audio_vq_ds_rate=2,
    ).eval().float()
    # randomize the codebook (init is kmeans-less zeros)
    g = torch.Generator().manual_seed(1)
    sd = ref.state_dict()
    sd["audio_quantizer.rvqs.0.embed"] = torch.randn(
        sd["audio_quantizer.rvqs.0.embed"].shape, generator=g)
    ref.load_state_dict(sd)

    cfg = WhisperVQEncoderConfig.from_dict(ENC_CFG)
    params = jax.tree.map(jnp.asarray,
                          convert_whisper_vq({k: v.numpy() for k, v in ref.state_dict().items()},
                                             cfg, prefix=""))

    rng = np.random.RandomState(2)
    t_mel = 96  # 3 chunks of n_window*2=32
    mel = rng.randn(ENC_CFG["n_mels"], t_mel).astype(np.float32)
    t_cnn = get_T_after_cnn(t_mel)

    with torch.no_grad():
        _, want = ref(
            x_list=[torch.from_numpy(mel)],
            audio_mellens=[t_mel], audio_aftercnnlens=[t_cnn],
            audio_seqlens=[t_cnn + 2], return_indices=True)
    want = want.numpy()

    got = np.asarray(whisper_vq_encode(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    agree = (got == want).mean()
    assert agree > 0.97, f"code agreement {agree}"


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


def test_whisper_vq_full_output_parity():
    """Full (non-indices) encoder path vs reference WhisperEncoderVQ."""
    _patch_mel_filters()
    import torch as th
    from qwen_tts.core.tokenizer_25hz.vq.speech_vq import WhisperEncoderVQ

    from qwen3_tts_tpu.models.codec25.whisper_vq import whisper_vq_full_output

    th.manual_seed(5)
    ref = WhisperEncoderVQ(
        n_mels=ENC_CFG["n_mels"], n_ctx=ENC_CFG["n_ctx"], n_state=ENC_CFG["n_state"],
        n_head=ENC_CFG["n_head"], n_layer=ENC_CFG["n_layer"],
        n_window=ENC_CFG["n_window"], output_dim=ENC_CFG["output_dim"],
        audio_vq_layers=ENC_CFG["audio_vq_layers"], audio_vq_type="GRVQ",
        audio_vq_codebook_size=ENC_CFG["audio_vq_codebook_size"],
        audio_vq_pe=True, audio_vq_codebook_dim=ENC_CFG["audio_vq_codebook_dim"],
        audio_vq_ds_rate=2,
    ).eval().float()
    g = th.Generator().manual_seed(6)
    sd = ref.state_dict()
    sd["audio_quantizer.rvqs.0.embed"] = th.randn(
        sd["audio_quantizer.rvqs.0.embed"].shape, generator=g)
    ref.load_state_dict(sd)

    cfg = WhisperVQEncoderConfig.from_dict(ENC_CFG)
    params = jax.tree.map(jnp.asarray,
                          convert_whisper_vq({k: v.numpy() for k, v in ref.state_dict().items()},
                                             cfg, prefix=""))
    rng = np.random.RandomState(7)
    t_mel = 64
    mel = rng.randn(ENC_CFG["n_mels"], t_mel).astype(np.float32)
    t_cnn = get_T_after_cnn(t_mel)

    with torch.no_grad():
        want, _ = ref(x_list=[torch.from_numpy(mel)], audio_mellens=[t_mel],
                      audio_aftercnnlens=[t_cnn],
                      audio_seqlens=[t_cnn // 2 + 2], return_indices=False)
    want = want.numpy()
    got = np.asarray(whisper_vq_full_output(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, atol=5e-4)
