"""Speaker encoder parity vs reference module + mel front-end numerics."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _reference import install_reference

install_reference()

from qwen_tts.core.models.configuration_qwen3_tts import (  # noqa: E402
    Qwen3TTSSpeakerEncoderConfig)
from qwen_tts.core.models.modeling_qwen3_tts import Qwen3TTSSpeakerEncoder  # noqa: E402

from qwen3_tts_tpu.config import SpeakerEncoderConfig  # noqa: E402
from qwen3_tts_tpu.models.speaker_encoder import (  # noqa: E402
    convert_speaker_encoder, speaker_encode)
from qwen3_tts_tpu.ops.mel import (hann_window, mel_filterbank, mel_spectrogram,
                                   stft_magnitude)  # noqa: E402

SPK_CFG = dict(
    mel_dim=16, enc_dim=32,
    enc_channels=[24, 24, 24, 24, 72],
    enc_kernel_sizes=[5, 3, 3, 3, 1],
    enc_dilations=[1, 2, 3, 4, 1],
    enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8,
)


def test_speaker_encoder_parity():
    torch.manual_seed(0)
    ref = Qwen3TTSSpeakerEncoder(Qwen3TTSSpeakerEncoderConfig(**SPK_CFG)).eval().float()
    cfg = SpeakerEncoderConfig.from_dict(SPK_CFG)
    params = jax.tree.map(
        jnp.asarray,
        convert_speaker_encoder({k: v.numpy() for k, v in ref.state_dict().items()},
                                cfg, prefix=""))
    mels = np.random.RandomState(0).randn(2, 40, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mels)).numpy()
    got = np.asarray(speaker_encode(params, cfg, jnp.asarray(mels)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_mel_filterbank_matches_librosa_snapshot():
    """The reference ships librosa-generated whisper filters — our slaney
    filterbank must reproduce them."""
    d = np.load("/root/reference/qwen_tts/core/tokenizer_25hz/vq/assets/mel_filters.npz")
    for n_mels in (80, 128):
        got = mel_filterbank(16000, 400, n_mels)
        np.testing.assert_allclose(got, d[f"mel_{n_mels}"], atol=2e-7)


def test_stft_matches_torch():
    y = np.random.RandomState(1).randn(2, 4096).astype(np.float32) * 0.3
    n_fft, hop = 1024, 256
    win = torch.hann_window(n_fft)
    ref = torch.stft(torch.from_numpy(y), n_fft, hop_length=hop, win_length=n_fft,
                     window=win, center=False, return_complex=True)
    ref_mag = torch.sqrt(ref.real ** 2 + ref.imag ** 2 + 1e-9).numpy()
    got = np.asarray(stft_magnitude(jnp.asarray(y), n_fft, hop,
                                    jnp.asarray(hann_window(n_fft))))
    np.testing.assert_allclose(got, ref_mag, atol=2e-4)


def test_mel_spectrogram_shape_and_range():
    y = np.random.RandomState(2).randn(1, 24000).astype(np.float32) * 0.1
    m = np.asarray(mel_spectrogram(jnp.asarray(y)))
    assert m.shape[1] == 128
    # log-clamped at log(1e-5)
    assert m.min() >= np.log(1e-5) - 1e-4


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
