"""Unit tests of the NN primitives against independent (torch/numpy) math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from qwen3_tts_tpu.nn import (DecoderSpec, KVCache, apply_rope, cache_attention_mask,
                              causal_mask, gqa_attention, init_stack_params,
                              make_inv_freq, make_suppress_mask, rms_norm,
                              rope_cos_sin, stack_forward, swiglu_mlp)
from qwen3_tts_tpu.nn.sampling import (SamplingConfig, apply_top_k, apply_top_p,
                                       apply_repetition_penalty, process_logits)


def test_rms_norm_matches_torch():
    x = np.random.randn(2, 5, 64).astype(np.float32)
    w = np.random.randn(64).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    ref = torch.from_numpy(w) * (xt * torch.rsqrt(var + 1e-6))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_rope_matches_torch_reference():
    """RoPE vs the reference formula (cos/sin tables + rotate_half)."""
    d = 32
    inv_freq = make_inv_freq(d, 10000.0)
    pos = jnp.asarray([[0, 1, 2, 5]])
    cos, sin = rope_cos_sin(pos, inv_freq)
    # torch reference
    inv_t = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
    freqs = torch.tensor([[0., 1., 2., 5.]])[..., None] * inv_t
    emb = torch.cat([freqs, freqs], dim=-1)
    np.testing.assert_allclose(np.asarray(cos), emb.cos().numpy(), atol=2e-5)

    q = np.random.randn(1, 4, 2, d).astype(np.float32)
    k = np.random.randn(1, 4, 1, d).astype(np.float32)
    qr, kr = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)

    def rot_half(x):
        half = x.shape[-1] // 2
        return torch.cat([-x[..., half:], x[..., :half]], dim=-1)

    qt = torch.from_numpy(q)
    ct, st_ = emb.cos()[:, :, None, :], emb.sin()[:, :, None, :]
    q_ref = qt * ct + rot_half(qt) * st_
    np.testing.assert_allclose(np.asarray(qr), q_ref.numpy(), atol=1e-5)


def test_gqa_attention_matches_torch_sdpa():
    b, t, h, hkv, d = 2, 7, 8, 2, 16
    q = np.random.randn(b, t, h, d).astype(np.float32)
    k = np.random.randn(b, t, hkv, d).astype(np.float32)
    v = np.random.randn(b, t, hkv, d).astype(np.float32)
    mask = causal_mask(t, t)[None, None]
    got = gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(mask), scaling=d ** -0.5)

    qt = torch.from_numpy(q).permute(0, 2, 1, 3)  # B,H,T,D
    kt = torch.from_numpy(k).permute(0, 2, 1, 3).repeat_interleave(h // hkv, dim=1)
    vt = torch.from_numpy(v).permute(0, 2, 1, 3).repeat_interleave(h // hkv, dim=1)
    ref = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, is_causal=True)
    ref = ref.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_gqa_head_grouping_order():
    """Grouped heads must map q-head i to kv-head i // group_size (HF repeat_kv)."""
    b, t, h, hkv, d = 1, 3, 4, 2, 8
    q = np.random.randn(b, t, h, d).astype(np.float32)
    k = np.random.randn(b, t, hkv, d).astype(np.float32)
    v = np.random.randn(b, t, hkv, d).astype(np.float32)
    got = gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, 1.0)
    # manual per-head
    for head in range(h):
        kvh = head // (h // hkv)
        s = np.einsum("td,sd->ts", q[0, :, head], k[0, :, kvh])
        p = torch.softmax(torch.from_numpy(s), dim=-1).numpy()
        o = np.einsum("ts,sd->td", p, v[0, :, kvh])
        np.testing.assert_allclose(np.asarray(got)[0, :, head], o, atol=1e-5)


def test_sliding_window_mask():
    m = causal_mask(5, 5, 0, sliding_window=2)
    m = np.asarray(m)
    assert m[4, 4] and m[4, 3] and not m[4, 2]
    assert not m[0, 1]


def test_stack_forward_cache_matches_full():
    """Prefill+decode through the KV cache must equal the full no-cache forward."""
    spec = DecoderSpec(hidden_size=32, intermediate_size=64, num_layers=3,
                       num_heads=4, num_kv_heads=2, head_dim=8)
    params = init_stack_params(jax.random.PRNGKey(0), spec)
    b, t_total, t_prefill = 2, 6, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t_total, 32))
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    pos = jnp.broadcast_to(jnp.arange(t_total)[None], (b, t_total))
    cos, sin = rope_cos_sin(pos, inv)

    full_mask = causal_mask(t_total, t_total)[None, None]
    y_full, _ = stack_forward(spec, params, x, cos, sin, full_mask, None)

    cache = KVCache.create(3, b, t_total, 2, 8, dtype=jnp.float32)
    ones = jnp.ones((b, t_total), jnp.int32)
    m = cache_attention_mask(ones, t_prefill, cache.index, t_total)
    y_pre, cache = stack_forward(spec, params, x[:, :t_prefill],
                                 cos[:, :t_prefill], sin[:, :t_prefill], m, cache)
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_full[:, :t_prefill]),
                               atol=1e-5)
    outs = [y_pre]
    for i in range(t_prefill, t_total):
        m = cache_attention_mask(ones, 1, cache.index, t_total)
        y_i, cache = stack_forward(spec, params, x[:, i:i + 1],
                                   cos[:, i:i + 1], sin[:, i:i + 1], m, cache)
        outs.append(y_i)
    y_cached = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_cached), np.asarray(y_full), atol=1e-4)


def test_left_padding_equivalence():
    """A left-padded row must produce the same final output as unpadded."""
    spec = DecoderSpec(hidden_size=32, intermediate_size=64, num_layers=2,
                       num_heads=4, num_kv_heads=4, head_dim=8)
    params = init_stack_params(jax.random.PRNGKey(0), spec)
    t, pad = 5, 3
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, 32))
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)

    pos = jnp.arange(t)[None]
    cos, sin = rope_cos_sin(pos, inv)
    y_ref, _ = stack_forward(spec, params, x, cos, sin,
                             causal_mask(t, t)[None, None], None)

    xp = jnp.concatenate([jnp.zeros((1, pad, 32)), x], axis=1)
    maskp = jnp.concatenate([jnp.zeros((1, pad), jnp.int32),
                             jnp.ones((1, t), jnp.int32)], axis=1)
    posp = jnp.maximum(jnp.cumsum(maskp, axis=-1) - 1, 0)
    cosp, sinp = rope_cos_sin(posp, inv)
    cache = KVCache.create(2, 1, t + pad, 4, 8, dtype=jnp.float32)
    m = cache_attention_mask(maskp, t + pad, cache.index, t + pad)
    y_pad, _ = stack_forward(spec, params, xp, cosp, sinp, m, cache)
    np.testing.assert_allclose(np.asarray(y_pad[:, pad:]), np.asarray(y_ref), atol=1e-4)


# ------------------------- sampling pipeline -------------------------------


def test_top_k_matches_hf():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5, -1.0]])
    got = np.asarray(apply_top_k(logits, 2))
    assert np.isfinite(got[0, 1]) and np.isfinite(got[0, 2])
    assert got[0, 0] < -1e8 and got[0, 3] < -1e8 and got[0, 4] < -1e8


def test_top_p_matches_hf():
    from transformers.generation.logits_process import TopPLogitsWarper
    logits = np.random.randn(3, 50).astype(np.float32) * 2
    p = 0.8
    got = np.asarray(apply_top_p(jnp.asarray(logits), p))
    ref = TopPLogitsWarper(top_p=p)(None, torch.from_numpy(logits)).numpy()
    got_kept = got > -1e8
    ref_kept = ref > -1e30
    np.testing.assert_array_equal(got_kept, ref_kept)


def test_repetition_penalty_matches_hf():
    from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor
    vocab = 20
    logits = np.random.randn(2, vocab).astype(np.float32)
    ids = torch.tensor([[3, 5, 3], [1, 2, 4]])
    seen = np.zeros((2, vocab), bool)
    for r in range(2):
        for t_ in ids[r]:
            seen[r, t_] = True
    got = np.asarray(apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(seen), 1.3))
    ref = RepetitionPenaltyLogitsProcessor(1.3)(ids, torch.from_numpy(logits)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_suppress_mask():
    m = np.asarray(make_suppress_mask(3072, 1024, (2150,)))
    assert m[3071] and m[2048] and not m[2150] and not m[2047]


def test_bisect_topk_matches_sort_path_large_batch():
    """Serving-default bisection path (batch >= 16) vs the sorted kept set,
    including suppressed rows (NEG_INF lanes) and k > finite-lane count."""
    from qwen3_tts_tpu.nn.sampling import _BISECT_MIN_BATCH, apply_top_k_batched

    rng = np.random.default_rng(0)
    b, v = max(_BISECT_MIN_BATCH, 20), 257
    logits = rng.standard_normal((b, v)).astype(np.float32) * 3
    logits[3, 40:] = -1e9            # suppressed band
    logits[5, 1:] = -1e9             # only one finite lane, k=50 > finite count
    k = rng.integers(1, 64, size=(b,)).astype(np.int32)
    k[5] = 50
    k[7] = 0                         # disabled row passes through
    got = np.asarray(apply_top_k_batched(jnp.asarray(logits), jnp.asarray(k)))
    for r in range(b):
        kept = got[r] > -1e8
        if k[r] <= 0 or k[r] >= v:
            assert kept.sum() == (logits[r] > -1e8).sum()
            continue
        order = np.argsort(logits[r])[::-1]
        ref_kept = np.zeros(v, bool)
        ref_kept[order[:k[r]]] = True
        ref_kept &= logits[r] > -1e8   # NEG_INF lanes never survive masking
        np.testing.assert_array_equal(kept, ref_kept, err_msg=f"row {r}")


def test_bisect_topp_matches_sort_path_large_batch():
    """Bisection nucleus path vs sorted-path kept sets at batch >= 16,
    including boundary p values 0.0 and 1.0 (min_tokens_to_keep=1)."""
    from qwen3_tts_tpu.nn.sampling import (_BISECT_MIN_BATCH, apply_top_p_batched,
                                           _nucleus_thresh_sorted)

    rng = np.random.default_rng(1)
    b, v = max(_BISECT_MIN_BATCH, 20), 197
    logits = rng.standard_normal((b, v)).astype(np.float32) * 2
    logits[2, 10:] = -1e9
    p = rng.uniform(0.05, 0.95, size=(b,)).astype(np.float32)
    p[0] = 0.0   # must keep exactly the argmax, not mask everything
    p[1] = 1.0   # disabled
    p[4] = 1e-6  # near-zero
    got = np.asarray(apply_top_p_batched(jnp.asarray(logits), jnp.asarray(p)))
    jl = jnp.asarray(logits)
    thresh = np.asarray(_nucleus_thresh_sorted(jl, jnp.asarray(p)[:, None]))
    for r in range(b):
        kept = got[r] > -1e8
        assert kept.sum() >= 1, f"row {r}: all tokens masked (p={p[r]})"
        if p[r] >= 1.0:
            np.testing.assert_array_equal(kept, logits[r] > -1e8)
            continue
        ref_kept = logits[r] >= thresh[r, 0]
        np.testing.assert_array_equal(kept, ref_kept, err_msg=f"row {r} p={p[r]}")


def test_topp_zero_keeps_argmax_single():
    """apply_top_p at batch >= 16 with p=0 keeps exactly the row argmax."""
    from qwen3_tts_tpu.nn.sampling import _BISECT_MIN_BATCH

    rng = np.random.default_rng(2)
    logits = rng.standard_normal((_BISECT_MIN_BATCH, 64)).astype(np.float32)
    got = np.asarray(apply_top_p(jnp.asarray(logits), 1e-9))
    for r in range(logits.shape[0]):
        kept = np.flatnonzero(got[r] > -1e8)
        np.testing.assert_array_equal(kept, [np.argmax(logits[r])])


def test_greedy_chain_deterministic():
    cfg = SamplingConfig(do_sample=False)
    logits = jnp.asarray(np.random.randn(2, 30).astype(np.float32))
    out = process_logits(logits, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits), atol=1e-6)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
