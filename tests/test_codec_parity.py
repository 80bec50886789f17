"""Numerical parity of the 12Hz codec (vocoder decode + Mimi encode) against
the reference modules with random weights on CPU."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _reference import install_reference

install_reference()

from qwen_tts.core.tokenizer_12hz.configuration_qwen3_tts_tokenizer_v2 import (  # noqa: E402
    Qwen3TTSTokenizerV2DecoderConfig)
from qwen_tts.core.tokenizer_12hz.modeling_qwen3_tts_tokenizer_v2 import (  # noqa: E402
    Qwen3TTSTokenizerV2Decoder)
from transformers import MimiConfig, MimiModel  # noqa: E402

from qwen3_tts_tpu.config import CodecDecoderConfig, MimiEncoderConfig  # noqa: E402
from qwen3_tts_tpu.models.codec_decoder import (  # noqa: E402
    chunked_decode, codec_decode, init_codec_decoder_params)
from qwen3_tts_tpu.models.codec_encoder import codec_encode  # noqa: E402
from qwen3_tts_tpu.utils.weights import (  # noqa: E402
    convert_codec_decoder, convert_codec_encoder)

DEC_CFG = dict(
    codebook_size=32, hidden_size=32, latent_dim=16, max_position_embeddings=512,
    num_attention_heads=4, num_key_value_heads=4, sliding_window=8,
    intermediate_size=64, layer_scale_initial_scale=0.01, rms_norm_eps=1e-5,
    num_hidden_layers=2, num_quantizers=4, upsample_rates=(2, 2),
    upsampling_ratios=(2,), decoder_dim=32, codebook_dim=16,
)


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            t = torch.randn(v.shape, generator=g) * 0.05
            if "cluster_usage" in k:
                t = torch.rand(v.shape, generator=g) * 2 + 0.5
            if "alpha" in k or "beta" in k:
                t = torch.randn(v.shape, generator=g) * 0.1
            new[k] = t
        else:
            new[k] = v
    module.load_state_dict(new)
    return new


@pytest.fixture(scope="module")
def vocoder():
    ref_cfg = Qwen3TTSTokenizerV2DecoderConfig(**{**DEC_CFG, "attn_implementation": "eager"})
    ref = Qwen3TTSTokenizerV2Decoder._from_config(ref_cfg).eval().float()
    _randomize(ref)
    cfg = CodecDecoderConfig.from_dict(DEC_CFG)
    params = jax.tree.map(
        jnp.asarray,
        convert_codec_decoder({k: v.numpy() for k, v in ref.state_dict().items()},
                              cfg, prefix=""))
    return ref, cfg, params


def test_vocoder_decode_parity(vocoder):
    ref, cfg, params = vocoder
    rng = np.random.RandomState(0)
    codes = rng.randint(0, cfg.codebook_size, size=(2, cfg.num_quantizers, 12))
    with torch.no_grad():
        want = ref(torch.from_numpy(codes)).numpy()  # (B, 1, T_wav)
    got = np.asarray(codec_decode(params, cfg, jnp.asarray(codes)))
    assert got.shape == want[:, 0].shape
    np.testing.assert_allclose(got, want[:, 0], atol=2e-4)


def test_vocoder_chunked_decode_parity(vocoder):
    ref, cfg, params = vocoder
    rng = np.random.RandomState(1)
    codes = rng.randint(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 23))
    with torch.no_grad():
        want = ref.chunked_decode(torch.from_numpy(codes), chunk_size=8,
                                  left_context_size=3).numpy()
    got = np.asarray(chunked_decode(params, cfg, jnp.asarray(codes),
                                    chunk_size=8, left_context_size=3))
    assert got.shape == want[:, 0].shape
    np.testing.assert_allclose(got, want[:, 0], atol=2e-4)


MIMI_CFG = dict(
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


@pytest.fixture(scope="module")
def mimi():
    ref_cfg = MimiConfig(**{**MIMI_CFG, "attn_implementation": "eager"})
    ref = MimiModel(ref_cfg).eval().float()
    _randomize(ref, seed=3)
    cfg = MimiEncoderConfig.from_dict(MIMI_CFG)
    params = jax.tree.map(
        jnp.asarray,
        convert_codec_encoder({k: v.numpy() for k, v in ref.state_dict().items()},
                              cfg, prefix=""))
    return ref, cfg, params


def test_mimi_encode_parity(mimi):
    ref, cfg, params = mimi
    rng = np.random.RandomState(2)
    wav = (rng.randn(2, 1, 4800) * 0.1).astype(np.float32)
    with torch.no_grad():
        emb = ref.encoder(torch.from_numpy(wav))
        emb = ref.encoder_transformer(emb.transpose(1, 2))[0].transpose(1, 2)
        emb = ref.downsample(emb)
        want = ref.quantizer.encode(emb, num_quantizers=6).transpose(0, 1).numpy()
    got = np.asarray(codec_encode(params, cfg, jnp.asarray(wav[:, 0]),
                                  num_quantizers=6))
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    match = (got == want).mean()
    # codebook argmin ties under fp noise may differ on a few frames
    assert match > 0.98, f"code agreement {match}"


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


def test_fused_seanet_unit_parity():
    """ops/seanet_unit.py (Pallas fused residual unit, interpret mode) vs
    the XLA unit. HW verdict in NOTES.md: measured SLOWER than the XLA conv
    path at every SEANet shape (the small-channel conv's MXU underfill is
    intrinsic; channel-padding 48->128 costs more than fusion saves), so it
    is an opt-in artifact — parity is kept asserted so the measurement can
    be revisited on future hardware/toolchains."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tts_tpu.models.codec_decoder import residual_unit
    from qwen3_tts_tpu.ops.seanet_unit import fused_residual_unit

    key = jax.random.PRNGKey(0)
    for c, dil, t in ((48, 9, 1100), (96, 3, 1024)):
        ks = jax.random.split(key, 10)
        p = {name: (jax.random.normal(kk, s) * 0.1).astype(jnp.bfloat16)
             for name, kk, s in [
                 ("conv1_w", ks[0], (7, c, c)), ("conv1_b", ks[1], (c,)),
                 ("conv2_w", ks[2], (1, c, c)), ("conv2_b", ks[3], (c,)),
                 ("act1_alpha", ks[4], (c,)), ("act1_beta", ks[5], (c,)),
                 ("act2_alpha", ks[6], (c,)), ("act2_beta", ks[7], (c,))]}
        x = (jax.random.normal(ks[8], (2, t, c)) * 0.5).astype(jnp.bfloat16)
        ref = np.asarray(residual_unit(x, p, dil), np.float32)
        got = np.asarray(fused_residual_unit(x, p, dil, interpret=True),
                         np.float32)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 0.02
