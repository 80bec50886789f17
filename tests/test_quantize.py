"""Int8 weight-only quantization: numerics + end-to-end generation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.models.presets import tiny_talker
from qwen3_tts_tpu.models.talker import init_talker_params, quantize_talker_params
from qwen3_tts_tpu.models.generation import generate_frames, trim_codes
from qwen3_tts_tpu.nn.sampling import SamplingConfig
from qwen3_tts_tpu.nn.transformer import quantize_stack_params


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128)) * 0.1
    q = quantize_stack_params({"q_proj": w})
    deq = q["q_proj_q"].astype(jnp.float32) * q["q_proj_s"].astype(jnp.float32)
    err = np.abs(np.asarray(deq - w))
    scale = np.asarray(q["q_proj_s"], np.float32)
    assert err.max() <= scale.max() * 0.75  # within one quant step


def test_quantized_generation_runs_and_tracks_fp():
    cfg = tiny_talker()
    params = init_talker_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_talker_params(params)

    b, t = 2, 10
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.hidden_size)) * 0.3
    mask = jnp.ones((b, t), jnp.int32)
    trailing = jax.random.normal(jax.random.PRNGKey(2), (b, 6, cfg.hidden_size)) * 0.3
    pad_embed = jnp.zeros((1, cfg.hidden_size))
    greedy = SamplingConfig(do_sample=False)

    out_fp = generate_frames(params, cfg, embeds, mask, trailing, pad_embed,
                             jax.random.PRNGKey(0), 6, greedy, greedy)
    out_q = generate_frames(qparams, cfg, embeds, mask, trailing, pad_embed,
                            jax.random.PRNGKey(0), 6, greedy, greedy)
    codes_fp = trim_codes(out_fp)
    codes_q = trim_codes(out_q)
    # int8 is lossy; require structural validity + high greedy agreement
    for cf, cq in zip(codes_fp, codes_q):
        assert cq.shape[1] == cfg.num_code_groups
        n = min(len(cf), len(cq))
        if n:
            agree = (cf[:n] == cq[:n]).mean()
            assert agree > 0.5, f"quantized stream diverged entirely ({agree})"


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


def test_fused_params_identical_outputs():
    from qwen3_tts_tpu.models.talker import fuse_talker_params

    cfg = tiny_talker()
    params = init_talker_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    fused = fuse_talker_params(params)
    b, t = 2, 10
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.hidden_size)) * 0.3
    mask = jnp.ones((b, t), jnp.int32)
    trailing = jax.random.normal(jax.random.PRNGKey(2), (b, 6, cfg.hidden_size)) * 0.3
    pad_embed = jnp.zeros((1, cfg.hidden_size))
    greedy = SamplingConfig(do_sample=False)
    r0 = trim_codes(generate_frames(params, cfg, embeds, mask, trailing, pad_embed,
                                    jax.random.PRNGKey(0), 6, greedy, greedy))
    r1 = trim_codes(generate_frames(fused, cfg, embeds, mask, trailing, pad_embed,
                                    jax.random.PRNGKey(0), 6, greedy, greedy))
    for a, b_ in zip(r0, r1):
        np.testing.assert_array_equal(a, b_)
