"""Parity for the fused per-DecoderBlock SEANet kernel (ops/seanet_block.py)
vs the XLA residual-unit chain, interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.models.codec_decoder import residual_unit
from qwen3_tts_tpu.ops.seanet_block import fused_block_units


def _unit_params(key, c, k=7):
    ks = jax.random.split(key, 4)
    s = 0.05  # realistic scale: hot weights make the 3-unit chain chaotic
    # (snake's sin amplifies bf16 ulps into O(1) relative error)
    return {
        "conv1_w": (jax.random.normal(ks[0], (k, c, c)) * s).astype(jnp.bfloat16),
        "conv1_b": (jax.random.normal(ks[1], (c,)) * s).astype(jnp.bfloat16),
        "conv2_w": (jax.random.normal(ks[2], (1, c, c)) * s).astype(jnp.bfloat16),
        "conv2_b": (jax.random.normal(ks[3], (c,)) * s).astype(jnp.bfloat16),
        "act1_alpha": (jax.random.normal(ks[0], (c,)) * 0.3).astype(jnp.bfloat16),
        "act1_beta": (jax.random.normal(ks[1], (c,)) * 0.3).astype(jnp.bfloat16),
        "act2_alpha": (jax.random.normal(ks[2], (c,)) * 0.3).astype(jnp.bfloat16),
        "act2_beta": (jax.random.normal(ks[3], (c,)) * 0.3).astype(jnp.bfloat16),
    }


@pytest.mark.parametrize("c,t,b", [(96, 300, 2), (192, 150, 1)])
def test_fused_block_matches_xla_chain(c, t, b):
    units = tuple(_unit_params(jax.random.PRNGKey(10 + i), c)
                  for i in range(3))
    x = (jax.random.normal(jax.random.PRNGKey(0), (b, t, c)) * 0.5
         ).astype(jnp.bfloat16)

    ref = x
    for u, d in zip(units, (1, 3, 9)):
        ref = residual_unit(ref, u, d)

    got = fused_block_units(x, units, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    rf = np.asarray(ref, np.float32)
    gf = np.asarray(got, np.float32)
    # bf16 storage of intermediates in both paths; tap-accumulated vs
    # XLA-conv accumulation differs by a few ulps which snake's sin can
    # amplify over the 3-unit chain (same budget family as the step kernels)
    np.testing.assert_allclose(gf, rf, atol=0.12, rtol=0.08)
    # near-exact agreement on the vast majority of elements
    close = np.isclose(gf, rf, atol=0.04, rtol=0.04).mean()
    assert close > 0.97, f"only {close:.3f} within tight tolerance"


def test_fused_block_tile_boundaries():
    """Output must be continuous across the internal T_TILE boundary (the
    chained-context window math): compare a long signal against the XLA
    chain near the 2048-row tile edge for C=96->128 lanes."""
    c, t, b = 96, 2200, 1
    units = tuple(_unit_params(jax.random.PRNGKey(20 + i), c)
                  for i in range(3))
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, t, c)) * 0.5
         ).astype(jnp.bfloat16)
    ref = x
    for u, d in zip(units, (1, 3, 9)):
        ref = residual_unit(ref, u, d)
    got = fused_block_units(x, units, interpret=True)
    lo, hi = 2048 - 64, 2048 + 64
    np.testing.assert_allclose(np.asarray(got[:, lo:hi], np.float32),
                               np.asarray(ref[:, lo:hi], np.float32),
                               atol=0.08, rtol=0.05)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


def test_fast_sin_accuracy():
    """fast_sin (range-reduced Taylor-11, Cody-Waite) must stay ~1e-6 of
    the true sine over the full activation range the vocoder can produce."""
    from qwen3_tts_tpu.models.codec_decoder import fast_sin

    rng = np.random.RandomState(0)
    for lo, hi in ((-3.2, 3.2), (-300, 300), (-3000, 3000)):
        x = jnp.asarray(rng.uniform(lo, hi, 200000).astype(np.float32))
        err = np.abs(np.asarray(fast_sin(x))
                     - np.sin(np.asarray(x, np.float64)))
        assert err.max() < 2e-6, (lo, hi, err.max())
