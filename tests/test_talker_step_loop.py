"""Parity tests for the layer-pair fori_loop talker step kernel
(ops/talker_step_loop.py) against the XLA scan path, interpret mode on CPU.

L=4 exercises TWO fori_loop iterations, i.e. the cross-pair weight/KV
prefetch handoff and the end-of-loop drain; geometry mirrors
test_talker_step_kernel.py (tile-multiple widths).

Tolerance note: under CPU interpret mode the ROLLED `lax.fori_loop` body is
compiled by XLA:CPU as its own region, whose f32 dot accumulation can differ
from the flat (unrolled) graph by ~1 bf16 ulp; the residual stream doubles
that per layer. Replacing the fori_loop with a static Python loop (or
`unroll=True`) reproduces the unrolled kernel BITWISE, which proves the DMA
schedule itself is exact — so these tests assert allclose at a few-ulp
tolerance rather than array equality. Rolled-vs-unrolled parity on real
hardware is checked by `examples/bench_step_loop_compile.py --check-parity`
(device-side output comparison on identical weights/state)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.nn.cache import KVCache
from qwen3_tts_tpu.nn.rope import make_inv_freq, rope_cos_sin
from qwen3_tts_tpu.nn.transformer import (DecoderSpec, cache_attention_mask,
                                          fuse_stack_params, init_stack_params,
                                          quantize_stack_params, stack_forward)

L, H, NQ, NKV, D, INTER, V, S, B = 4, 1024, 8, 8, 128, 1024, 1024, 64, 2


def _spec():
    return DecoderSpec(hidden_size=H, intermediate_size=INTER, num_layers=L,
                       num_heads=NQ, num_kv_heads=NKV, head_dim=D,
                       qk_norm=True)


@pytest.fixture(scope="module")
def setup():
    spec = _spec()
    layers = init_stack_params(jax.random.PRNGKey(0), spec, jnp.bfloat16)
    layers = fuse_stack_params(layers)
    layers = quantize_stack_params(layers)
    head = (jax.random.normal(jax.random.PRNGKey(1), (H, V)) * 0.05)
    hs = jnp.max(jnp.abs(head), axis=0, keepdims=True) / 127.0
    head_q = jnp.clip(jnp.round(head / hs), -127, 127).astype(jnp.int8)
    return spec, layers, head_q, hs.astype(jnp.bfloat16)


def _xla_step(spec, layers, head_q, head_s, x, cos, sin, pad, cache):
    mask = cache_attention_mask(pad, 1, cache.index, S, None)
    h, cache = stack_forward(spec, layers, x[:, None], cos[:, None],
                             sin[:, None], mask, cache)
    last = h[:, -1]
    logits = last.astype(jnp.float32) @ (
        head_q.astype(jnp.float32) * head_s.astype(jnp.float32))
    return last, logits, cache


def test_loop_kernel_matches_xla(setup):
    from qwen3_tts_tpu.ops.talker_step_loop import fused_talker_step_loop

    spec, layers, head_q, head_s = setup
    inv_freq = make_inv_freq(D, spec.rope_theta)

    cache = KVCache.create(L, B, S, NKV, D, dtype=jnp.bfloat16)
    pre = (jax.random.normal(jax.random.PRNGKey(2), (B, 7, H)) * 0.3
           ).astype(jnp.bfloat16)
    pad = np.ones((B, S), np.int32)
    pad[1, :2] = 0
    pad = jnp.asarray(pad)
    pos = jnp.maximum(jnp.cumsum(pad[:, :7], axis=-1) - 1, 0)
    pcos, psin = rope_cos_sin(pos, inv_freq, jnp.bfloat16)
    mask = cache_attention_mask(pad, 7, cache.index, S, None)
    _, cache = stack_forward(spec, layers, pre, pcos, psin, mask, cache)

    x = (jax.random.normal(jax.random.PRNGKey(3), (B, H)) * 0.3
         ).astype(jnp.bfloat16)
    positions = jnp.asarray([[7], [5]], jnp.int32)
    cos, sin = rope_cos_sin(positions, inv_freq, jnp.bfloat16)

    ref_h, ref_logits, ref_cache = _xla_step(
        spec, layers, head_q, head_s, x, cos[:, 0], sin[:, 0], pad, cache)

    got_h, got_logits, kc, vc = fused_talker_step_loop(
        layers, layers["norm"], head_q, head_s,
        x, cos[:, 0], sin[:, 0], pad, cache.index,
        L, spec.rms_norm_eps,
        jnp.copy(cache.k), jnp.copy(cache.v), interpret=True)

    np.testing.assert_allclose(
        np.asarray(got_h, np.float32), np.asarray(ref_h, np.float32),
        atol=0.04, rtol=0.05)
    scale = float(jnp.max(jnp.abs(ref_logits))) + 1e-6
    err = float(jnp.max(jnp.abs(got_logits - ref_logits)))
    assert err / scale < 0.05, f"logits mismatch rel {err / scale}"
    # atol covers the O(1) post-norm K/V range; rtol keeps the bound valid
    # if magnitudes grow past 8 (one bf16 ulp > 0.04 there — r2 advice)
    np.testing.assert_allclose(
        np.asarray(kc, np.float32), np.asarray(ref_cache.k, np.float32),
        atol=0.04, rtol=0.01)
    np.testing.assert_allclose(
        np.asarray(vc, np.float32), np.asarray(ref_cache.v, np.float32),
        atol=0.04, rtol=0.01)


def test_loop_kernel_matches_unrolled(setup):
    """Loop and unrolled kernels on the same weights/state must agree to a
    few bf16 ulps (same math and schedule; the rolled loop body recompiles
    with slightly different f32 dot accumulation under interpret mode —
    see module docstring)."""
    from qwen3_tts_tpu.ops.talker_step import fused_talker_step
    from qwen3_tts_tpu.ops.talker_step_loop import fused_talker_step_loop

    spec, layers, head_q, head_s = setup
    cache = KVCache.create(L, B, S, NKV, D, dtype=jnp.bfloat16)
    cache = cache._replace(index=jnp.asarray(3, jnp.int32))
    kseed = jax.random.normal(jax.random.PRNGKey(7),
                              (L, B, S, NKV, D)) * 0.2
    kc0 = kseed.astype(jnp.bfloat16)
    vc0 = (kseed[..., ::-1] * 0.5).astype(jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(8), (B, H)) * 0.3
         ).astype(jnp.bfloat16)
    inv_freq = make_inv_freq(D, spec.rope_theta)
    cos, sin = rope_cos_sin(jnp.full((B, 1), 3, jnp.int32), inv_freq,
                            jnp.bfloat16)
    pad = jnp.ones((B, S), jnp.int32)

    a_h, a_l, a_k, a_v = fused_talker_step(
        layers, layers["norm"], head_q, head_s, x, cos[:, 0], sin[:, 0],
        pad, cache.index, L, spec.rms_norm_eps,
        jnp.copy(kc0), jnp.copy(vc0), interpret=True)
    b_h, b_l, b_k, b_v = fused_talker_step_loop(
        layers, layers["norm"], head_q, head_s, x, cos[:, 0], sin[:, 0],
        pad, cache.index, L, spec.rms_norm_eps,
        jnp.copy(kc0), jnp.copy(vc0), interpret=True)

    np.testing.assert_allclose(np.asarray(b_h, np.float32),
                               np.asarray(a_h, np.float32), atol=0.04,
                               rtol=0.02)
    np.testing.assert_allclose(np.asarray(b_l), np.asarray(a_l), atol=0.05,
                               rtol=0.05)
    np.testing.assert_allclose(np.asarray(b_k, np.float32),
                               np.asarray(a_k, np.float32), atol=0.04)
    np.testing.assert_allclose(np.asarray(b_v, np.float32),
                               np.asarray(a_v, np.float32), atol=0.04)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
