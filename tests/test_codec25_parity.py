"""25Hz decoder parity: DiT vector field and BigVGAN vs reference modules."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _reference import install_reference

install_reference()

from qwen_tts.core.tokenizer_25hz.configuration_qwen3_tts_tokenizer_v1 import (  # noqa: E402
    Qwen3TTSTokenizerV1DecoderBigVGANConfig, Qwen3TTSTokenizerV1DecoderDiTConfig)
from qwen_tts.core.tokenizer_25hz.modeling_qwen3_tts_tokenizer_v1 import (  # noqa: E402
    Qwen3TTSTokenizerV1DecoderBigVGANModel, Qwen3TTSTokenizerV1DecoderDiTModel)

from qwen3_tts_tpu.config import BigVGANConfig, DiTConfig  # noqa: E402
from qwen3_tts_tpu.models.codec25.bigvgan import bigvgan_forward  # noqa: E402
from qwen3_tts_tpu.models.codec25.convert import convert_bigvgan, convert_dit  # noqa: E402
from qwen3_tts_tpu.models.codec25.dit import dit_forward, dit_sample  # noqa: E402

DIT_CFG = dict(
    hidden_size=64, num_hidden_layers=3, num_attention_heads=4, ff_mult=2,
    emb_dim=32, head_dim=16, block_size=4, look_ahead_layers=[1],
    look_backward_layers=[0, 2], repeats=2, num_embeds=50, mel_dim=20,
    dropout=0.0,
    enc_emb_dim=24, enc_dim=16, enc_channels=[16, 16, 16, 16, 48],
    enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
    enc_attention_channels=8, enc_res2net_scale=2, enc_se_channels=8,
)

VGAN_CFG = dict(
    mel_dim=20, upsample_initial_channel=64,
    resblock_kernel_sizes=[3, 7], resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
    upsample_rates=[5, 3, 2], upsample_kernel_sizes=[11, 7, 4],
)


def test_dit_forward_parity():
    torch.manual_seed(0)
    ref = Qwen3TTSTokenizerV1DecoderDiTModel._from_config(
        Qwen3TTSTokenizerV1DecoderDiTConfig(**DIT_CFG),
        attn_implementation="sdpa").eval().float()
    cfg = DiTConfig.from_dict(DIT_CFG)
    params = jax.tree.map(jnp.asarray,
                          convert_dit({k: v.numpy() for k, v in ref.state_dict().items()},
                                      cfg, prefix=""))
    rng = np.random.RandomState(0)
    b, t_code = 2, 8
    t_mel = t_code * cfg.repeats
    x = rng.randn(b, t_mel, cfg.mel_dim).astype(np.float32)
    ref_mel = rng.randn(b, 12, cfg.mel_dim).astype(np.float32)
    xvec = rng.randn(b, cfg.enc_emb_dim).astype(np.float32)
    code = rng.randint(0, 50, size=(b, t_code))
    t = 0.3

    with torch.no_grad():
        # reference forward with CFG doubling
        want = ref(
            hidden_states=torch.from_numpy(x),
            condition_vector=torch.from_numpy(ref_mel),
            speaker_embedding=torch.from_numpy(xvec)[:, None, :].repeat(1, t_mel, 1),
            quantized_code=torch.from_numpy(code),
            time_step=torch.tensor(t),
            apply_cfg=True,
        ).numpy()

    xv = jnp.broadcast_to(jnp.asarray(xvec)[:, None, :], (b, t_mel, cfg.enc_emb_dim))
    got = np.asarray(dit_forward(params, cfg, jnp.asarray(x), jnp.asarray(ref_mel),
                                 xv, jnp.asarray(code), t, apply_cfg=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_bigvgan_parity():
    torch.manual_seed(1)
    ref = Qwen3TTSTokenizerV1DecoderBigVGANModel._from_config(
        Qwen3TTSTokenizerV1DecoderBigVGANConfig(**VGAN_CFG),
        attn_implementation="sdpa").eval().float()
    # randomize snake params away from zero
    sd = {}
    g = torch.Generator().manual_seed(2)
    for k, v in ref.state_dict().items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.05 if v.dtype.is_floating_point else v
    ref.load_state_dict(sd)

    cfg = BigVGANConfig.from_dict(VGAN_CFG)
    params = jax.tree.map(jnp.asarray,
                          convert_bigvgan({k: v.numpy() for k, v in ref.state_dict().items()},
                                          cfg, prefix=""))
    rng = np.random.RandomState(3)
    mel = rng.randn(2, cfg.mel_dim, 9).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()
    got = np.asarray(bigvgan_forward(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_dit_sample_smoke():
    cfg = DiTConfig.from_dict(DIT_CFG)
    from qwen3_tts_tpu.models.codec25.dit import init_dit_params

    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    code = jnp.asarray(np.random.RandomState(0).randint(0, 50, size=(1, 6)))
    ref_mel = jnp.asarray(np.random.RandomState(1).randn(1, 10, cfg.mel_dim),
                          jnp.float32)
    xvec = jnp.asarray(np.random.RandomState(2).randn(1, cfg.enc_emb_dim), jnp.float32)
    mel = dit_sample(params, cfg, code, ref_mel, xvec, jax.random.PRNGKey(3),
                     num_steps=4)
    assert mel.shape == (1, cfg.mel_dim, 12)
    assert np.isfinite(np.asarray(mel)).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
