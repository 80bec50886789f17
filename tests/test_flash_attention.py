"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.nn.attention import gqa_attention, make_prefill_mask
from qwen3_tts_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, pad, scaling, window=None):
    mask = make_prefill_mask(pad, q.shape[1], window)
    return gqa_attention(q, k, v, mask, scaling)


@pytest.mark.parametrize("window", [None, 96])
def test_flash_matches_xla(window):
    b, t, h, hkv, d = 2, 256, 4, 2, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, t, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, hkv, d), jnp.float32)
    pad = np.ones((b, t), np.int32)
    pad[1, :32] = 0  # left padding on row 1
    pad = jnp.asarray(pad)

    want = _ref(q, k, v, pad, d ** -0.5, window)
    got = flash_attention(q, k, v, pad, scaling=d ** -0.5,
                          sliding_window=window, interpret=True)
    # padded query rows are don't-care; compare valid rows only
    w = np.asarray(want)
    g = np.asarray(got)
    np.testing.assert_allclose(g[0], w[0], atol=2e-5)
    np.testing.assert_allclose(g[1, 32:], w[1, 32:], atol=2e-5)


def test_flash_gqa_grouping():
    """q-head i must read kv-head i // group (same as repeat_kv)."""
    b, t, h, hkv, d = 1, 128, 8, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(3), (b, t, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (b, t, hkv, d), jnp.float32)
    pad = jnp.ones((b, t), jnp.int32)
    want = _ref(q, k, v, pad, d ** -0.5)
    got = flash_attention(q, k, v, pad, scaling=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


def test_stack_prefill_flash_wiring_matches_xla():
    """stack_forward with flash_pad_mask (prefill at cache index 0) must
    match the cached-mask XLA path bit-for-tolerance."""
    from qwen3_tts_tpu.nn.cache import KVCache
    from qwen3_tts_tpu.nn.rope import make_inv_freq, rope_cos_sin
    from qwen3_tts_tpu.nn.transformer import (DecoderSpec, cache_attention_mask,
                                              init_stack_params, stack_forward)

    spec = DecoderSpec(hidden_size=64, intermediate_size=128, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=64)
    params = init_stack_params(jax.random.PRNGKey(0), spec)
    b, t, extra = 2, 160, 8
    cache_len = t + extra
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, spec.hidden_size),
                          jnp.float32)
    pad = np.ones((b, t), np.int32)
    pad[1, :24] = 0  # left-padded row
    pad = jnp.asarray(pad)

    positions = jnp.maximum(jnp.cumsum(pad, axis=-1) - 1, 0)
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)

    def run(flash):
        cache = KVCache.create(spec.num_layers, b, cache_len, spec.num_kv_heads,
                               spec.head_dim, dtype=x.dtype)
        if flash:
            return stack_forward(spec, params, x, cos, sin, None, cache,
                                 flash_pad_mask=pad, flash_interpret=True)
        pad_full = jnp.concatenate(
            [pad, jnp.ones((b, cache_len - t), pad.dtype)], axis=-1)
        mask = cache_attention_mask(pad_full, t, cache.index, cache_len,
                                    spec.sliding_window)
        return stack_forward(spec, params, x, cos, sin, mask, cache)

    want_h, want_cache = run(False)
    got_h, got_cache = run(True)
    # padded rows of the left-padded sample are don't-care
    np.testing.assert_allclose(np.asarray(got_h[0]), np.asarray(want_h[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_h[1, 24:]),
                               np.asarray(want_h[1, 24:]), atol=3e-5)
    # left-padded slots hold don't-care values (never attended later);
    # compare the valid slots only
    np.testing.assert_allclose(np.asarray(got_cache.k[:, 0, :t]),
                               np.asarray(want_cache.k[:, 0, :t]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cache.k[:, 1, 24:t]),
                               np.asarray(want_cache.k[:, 1, 24:t]), atol=1e-5)
    assert int(got_cache.index) == int(want_cache.index) == t
