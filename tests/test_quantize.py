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


def test_int8_kv_cache_decode_close_to_bf16():
    """Opt-in int8 KV cache (per-slot max-abs scales folded into the
    attention dots, nn/cache.py): prefill + decode over a quantized cache
    must track the full-precision cache closely, and the scale buffers must
    ride the cache through both the prefill scan and the unrolled decode."""
    from qwen3_tts_tpu.nn.cache import KVCache
    from qwen3_tts_tpu.nn.rope import make_inv_freq, rope_cos_sin
    from qwen3_tts_tpu.nn.transformer import (DecoderSpec, cache_attention_mask,
                                              init_stack_params, stack_forward)

    spec = DecoderSpec(hidden_size=64, intermediate_size=96, num_layers=3,
                       num_heads=4, num_kv_heads=2, head_dim=16)
    params = init_stack_params(jax.random.PRNGKey(0), spec, jnp.float32)
    b, t, s_max = 2, 5, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, spec.hidden_size)) * 0.5
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_cos_sin(pos, inv, jnp.float32)
    pad = jnp.ones((b, s_max), jnp.int32)

    outs = {}
    for dtype in (jnp.float32, jnp.int8):
        cache = KVCache.create(spec.num_layers, b, s_max, spec.num_kv_heads,
                               spec.head_dim, dtype=dtype)
        assert cache.quantized == (dtype == jnp.int8)
        mask = cache_attention_mask(pad, t, cache.index, s_max, None)
        h, cache = stack_forward(spec, params, x, cos, sin, mask, cache)
        # two decode steps over the cache
        for step in range(2):
            p1 = jnp.full((b, 1), t + step, jnp.int32)
            c1, s1 = rope_cos_sin(p1, inv, jnp.float32)
            x1 = jax.random.normal(jax.random.PRNGKey(5 + step),
                                   (b, 1, spec.hidden_size)) * 0.5
            m1 = cache_attention_mask(pad, 1, cache.index, s_max, None)
            h, cache = stack_forward(spec, params, x1, c1, s1, m1, cache)
        outs[dtype] = np.asarray(h)
        if dtype == jnp.int8:
            assert cache.k.dtype == jnp.int8
            assert cache.k_scale is not None
            # scales were written for every filled slot
            assert float(jnp.max(cache.k_scale[:, :, :t + 2])) > 0

    err = np.max(np.abs(outs[jnp.int8] - outs[jnp.float32]))
    ref = np.max(np.abs(outs[jnp.float32])) + 1e-9
    assert err / ref < 0.05, f"int8 KV deviates {err / ref:.4f}"
