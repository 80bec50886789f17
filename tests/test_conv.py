"""Conv primitives vs torch reference numerics (vocoder/codec building blocks)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.nn.conv import (causal_conv1d, causal_transconv1d, conv1d,
                                   transconv1d_right_trim)


def to_nwc(x):
    return jnp.asarray(x.transpose(0, 2, 1))


def from_nwc(y):
    return np.asarray(y).transpose(0, 2, 1)


def test_conv1d_strided():
    B, T, I, O, K = 2, 20, 6, 8, 5
    x = np.random.randn(B, I, T).astype(np.float32)
    tc = torch.nn.Conv1d(I, O, K, stride=2)
    ref = tc(torch.from_numpy(x)).detach().numpy()
    w = jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0))
    got = conv1d(to_nwc(x), w, jnp.asarray(tc.bias.detach().numpy()), stride=2)
    np.testing.assert_allclose(from_nwc(got), ref, atol=1e-5)


def test_causal_conv_grouped_dilated():
    """Depthwise dilated causal conv (ConvNeXt / residual-unit pattern)."""
    B, T, C = 2, 30, 6
    x = np.random.randn(B, C, T).astype(np.float32)
    tc = torch.nn.Conv1d(C, C, 7, groups=C, dilation=3)
    pad = (7 - 1) * 3
    ref = tc(torch.nn.functional.pad(torch.from_numpy(x), (pad, 0))).detach().numpy()
    w = jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0))
    got = causal_conv1d(to_nwc(x), w, jnp.asarray(tc.bias.detach().numpy()),
                        dilation=3, groups=C)
    np.testing.assert_allclose(from_nwc(got), ref, atol=1e-5)


def test_causal_transconv_reference_trim():
    """Transposed conv trimmed (K - stride) from both sides — the reference's
    CausalTransConvNet arithmetic (modeling_..._v2.py:195-207)."""
    B, T, I, O, r = 2, 12, 6, 8, 4
    x = np.random.randn(B, I, T).astype(np.float32)
    tt = torch.nn.ConvTranspose1d(I, O, 2 * r, stride=r)
    full = tt(torch.from_numpy(x)).detach().numpy()
    trim = 2 * r - r
    ref = full[:, :, trim:full.shape[2] - trim]
    w = jnp.asarray(tt.weight.detach().numpy().transpose(2, 1, 0))  # (K, O, I)
    got = causal_transconv1d(to_nwc(x), w, jnp.asarray(tt.bias.detach().numpy()), stride=r)
    np.testing.assert_allclose(from_nwc(got), ref, atol=1e-5)
    assert got.shape[1] == (T - 1) * r


def test_transconv_exact_factor():
    """K == stride (upsample stage): no trim, exact T*factor output."""
    B, T, C, r = 1, 9, 4, 2
    x = np.random.randn(B, C, T).astype(np.float32)
    tt = torch.nn.ConvTranspose1d(C, C, r, stride=r)
    ref = tt(torch.from_numpy(x)).detach().numpy()
    w = jnp.asarray(tt.weight.detach().numpy().transpose(2, 1, 0))
    got = causal_transconv1d(to_nwc(x), w, jnp.asarray(tt.bias.detach().numpy()), stride=r)
    np.testing.assert_allclose(from_nwc(got), ref, atol=1e-5)
    assert got.shape[1] == T * r


def test_mimi_right_trim_transconv():
    B, T, I, O, r = 1, 7, 4, 4, 2
    x = np.random.randn(B, I, T).astype(np.float32)
    tt = torch.nn.ConvTranspose1d(I, O, 2 * r, stride=r)
    full = tt(torch.from_numpy(x)).detach().numpy()
    pad_total = 2 * r - r
    ref = full[:, :, : full.shape[2] - pad_total]
    w = jnp.asarray(tt.weight.detach().numpy().transpose(2, 1, 0))
    got = transconv1d_right_trim(to_nwc(x), w, jnp.asarray(tt.bias.detach().numpy()),
                                 stride=r, trim_right_ratio=1.0)
    np.testing.assert_allclose(from_nwc(got), ref, atol=1e-5)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
