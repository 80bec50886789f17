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
