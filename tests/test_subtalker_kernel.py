"""Parity tests for the fused Pallas sub-talker micro-step kernel.

The kernel hard-codes the production code-predictor geometry (1024 hidden,
3072 intermediate, 16q/8kv heads, d128 — reference
configuration_qwen3_tts.py:70-256), so these tests run the predictor at real
dims (in Pallas interpret mode on CPU) around a shrunken talker.
"""

import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig
from qwen3_tts_tpu.models.talker import (code_predictor_generate,
                                         fuse_talker_params, init_talker_params,
                                         pack_talker_params,
                                         quantize_talker_params)
from qwen3_tts_tpu.nn.sampling import SamplingConfig


def _cfg():
    cp = CodePredictorConfig(vocab_size=96, num_code_groups=16)
    return TalkerConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=32, text_vocab_size=64, text_hidden_size=48,
        num_code_groups=16, codec_eos_token_id=90, code_predictor=cp)


@pytest.fixture(scope="module")
def quantized_params():
    cfg = _cfg()
    params = init_talker_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = fuse_talker_params(params)
    params = quantize_talker_params(params)
    return cfg, params


def _strip_frame(packed_params):
    """Packed params routed through the per-micro-step kernel only."""
    p = dict(packed_params)
    cp = dict(p["code_predictor"])
    cp.pop("frame_packed", None)
    p["code_predictor"] = cp
    return p


def test_fused_microstep_matches_xla_stack(quantized_params):
    """Full nested-AR generate: fused kernel path vs the XLA scan path on the
    same int8 weights, greedy sampling -> identical codes, close hiddens."""
    cfg, params = quantized_params
    packed_params = _strip_frame(pack_talker_params(params))

    b = 2
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    past_hidden = (jax.random.normal(k1, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    first_embed = (jax.random.normal(k2, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    sampling = SamplingConfig(do_sample=False)

    codes_ref, sum_ref = code_predictor_generate(
        params, cfg, past_hidden, first_embed, jax.random.PRNGKey(3), sampling)
    codes_fused, sum_fused = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed, jax.random.PRNGKey(3), sampling)

    assert codes_fused.shape == (b, cfg.num_code_groups - 1)
    match = (codes_ref == codes_fused).mean()
    assert match == 1.0, f"greedy code mismatch: {match}\n{codes_ref}\n{codes_fused}"
    err = jnp.max(jnp.abs(sum_ref.astype(jnp.float32) - sum_fused.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(sum_ref.astype(jnp.float32))) + 1e-6
    assert err / scale < 0.05, f"embed_sum mismatch: rel {err / scale}"


def test_fused_decode_step_end_to_end(quantized_params):
    """talker_decode_step with packed params runs and returns valid frames."""
    from qwen3_tts_tpu.models.talker import (TalkerState, talker_decode_step,
                                             talker_spec)
    from qwen3_tts_tpu.nn.cache import KVCache
    from qwen3_tts_tpu.nn.sampling import make_suppress_mask

    cfg, params = quantized_params
    packed_params = pack_talker_params(params)
    spec = talker_spec(cfg)
    b, s_max = 2, 16

    cache = KVCache.create(spec.num_layers, b, s_max, spec.num_kv_heads,
                           spec.head_dim, dtype=jnp.bfloat16)
    cache = cache._replace(index=jnp.int32(4))
    state = TalkerState(
        cache=cache,
        token0=jnp.array([5, 9], jnp.int32),
        past_hidden=jnp.zeros((b, cfg.hidden_size), jnp.bfloat16),
        seen=jnp.zeros((b, cfg.vocab_size), bool),
        done=jnp.zeros((b,), bool),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((b,), jnp.int32),
        num_pads=jnp.zeros((b,), jnp.int32),
    )
    trailing = jnp.zeros((b, 3, cfg.hidden_size), jnp.bfloat16)
    pad_embed = jnp.zeros((1, cfg.hidden_size), jnp.bfloat16)
    pad_mask = jnp.ones((b, s_max), jnp.int32)
    sampling = SamplingConfig(do_sample=False)
    suppress = make_suppress_mask(cfg.vocab_size, 8, (cfg.codec_eos_token_id,))

    new_state, frame, _ = talker_decode_step(
        packed_params, cfg, state, trailing, pad_embed, pad_mask,
        sampling, sampling, suppress)
    assert frame.shape == (b, cfg.num_code_groups)
    assert (frame[:, 1:] >= 0).all() and (frame[:, 1:] < cfg.code_predictor.vocab_size).all()
    assert int(new_state.cache.index) == 5


def test_frame_megakernel_greedy_matches_xla(quantized_params):
    """Single-dispatch frame megakernel (b<=MAX_B, top_p=1) vs the XLA path:
    identical greedy codes, close embed sums."""
    cfg, params = quantized_params
    packed_params = pack_talker_params(params)
    assert "frame_packed" in packed_params["code_predictor"]

    b = 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    past_hidden = (jax.random.normal(k1, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    first_embed = (jax.random.normal(k2, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    sampling = SamplingConfig(do_sample=False)

    codes_ref, sum_ref = code_predictor_generate(
        params, cfg, past_hidden, first_embed, jax.random.PRNGKey(3), sampling)
    codes_frame, sum_frame = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed, jax.random.PRNGKey(3), sampling)

    assert codes_frame.shape == (b, cfg.num_code_groups - 1)
    assert (codes_ref == codes_frame).all(), f"{codes_ref}\n{codes_frame}"
    err = jnp.max(jnp.abs(sum_ref.astype(jnp.float32) - sum_frame.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(sum_ref.astype(jnp.float32))) + 1e-6
    assert err / scale < 0.05, f"embed_sum mismatch: rel {err / scale}"


def test_frame_megakernel_sampled_matches_xla(quantized_params):
    """Sampled mode: the kernel consumes the same gumbel draws
    jax.random.categorical makes, so tokens match the XLA path draw-for-draw
    (up to near-tie logit noise; this seed has none)."""
    cfg, params = quantized_params
    packed_params = pack_talker_params(params)

    b = 1
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    past_hidden = (jax.random.normal(k1, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    first_embed = (jax.random.normal(k2, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    sampling = SamplingConfig(do_sample=True, top_k=7, temperature=0.9)

    codes_ref, _ = code_predictor_generate(
        _strip_frame(packed_params), cfg, past_hidden, first_embed,
        jax.random.PRNGKey(5), sampling)
    codes_frame, _ = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed,
        jax.random.PRNGKey(5), sampling)

    match = (codes_ref == codes_frame).mean()
    assert match == 1.0, f"sampled mismatch {match}:\n{codes_ref}\n{codes_frame}"


def test_frame_megakernel_top_p_matches_xla(quantized_params):
    """In-kernel nucleus (top_p<1) via threshold bisection must reproduce
    apply_top_p's kept set: same sampled codes draw-for-draw vs the
    micro-step path (which samples at the XLA level)."""
    cfg, params = quantized_params
    packed_params = pack_talker_params(params)

    b = 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(31))
    past_hidden = (jax.random.normal(k1, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    first_embed = (jax.random.normal(k2, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    sampling = SamplingConfig(do_sample=True, top_k=0, top_p=0.8, temperature=0.9)

    codes_ref, _ = code_predictor_generate(
        _strip_frame(packed_params), cfg, past_hidden, first_embed,
        jax.random.PRNGKey(5), sampling)
    codes_frame, _ = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed,
        jax.random.PRNGKey(5), sampling)

    match = (codes_ref == codes_frame).mean()
    assert match == 1.0, f"top_p mismatch {match}:\n{codes_ref}\n{codes_frame}"


def test_frame_megakernel_serving_batch(quantized_params):
    """Batch above the old VMEM-comfort bound (the b=32 serving config path,
    shrunk to b=6 for CPU interpret): greedy codes still match XLA exactly.

    Seed note: the XLA head computes bf16 logits while the kernel accumulates
    in f32, so seeds whose top-2 logit gap is within bf16 resolution (~0.04
    at these magnitudes with this test's random tiny-vocab weights) can flip
    greedy ties; this seed is gap-checked tie-free."""
    cfg, params = quantized_params
    packed_params = pack_talker_params(params)

    b = 6
    k1, k2 = jax.random.split(jax.random.PRNGKey(55))
    past_hidden = (jax.random.normal(k1, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    first_embed = (jax.random.normal(k2, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    sampling = SamplingConfig(do_sample=False)

    codes_ref, _ = code_predictor_generate(
        params, cfg, past_hidden, first_embed, jax.random.PRNGKey(3), sampling)
    codes_frame, _ = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed, jax.random.PRNGKey(3),
        sampling)
    assert (codes_ref == codes_frame).all()


def test_frame_megakernel_per_row_sampling(quantized_params):
    """Per-ROW traced sampling knobs (continuous batching, r2 verdict weak
    #8): heterogeneous rows — sampled top-k, greedy-as-top_k=1, nucleus —
    through the megakernel must match the XLA batched processor chain
    draw-for-draw, and broadcasting a static config must reproduce the
    static specialization."""
    from qwen3_tts_tpu.nn.sampling import BatchedSampling

    cfg, params = quantized_params
    packed_params = pack_talker_params(params)

    b = 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(41))
    past_hidden = (jax.random.normal(k1, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)
    first_embed = (jax.random.normal(k2, (b, cfg.hidden_size)) * 0.5).astype(jnp.bfloat16)

    bs = BatchedSampling.broadcast(SamplingConfig(), b)
    bs = bs.row(0, SamplingConfig(do_sample=True, top_k=7, temperature=0.9))
    bs = bs.row(1, SamplingConfig(do_sample=False))  # greedy -> top_k=1
    bs = bs.row(2, SamplingConfig(do_sample=True, top_k=0, top_p=0.8,
                                  temperature=1.3))

    codes_ref, sum_ref = code_predictor_generate(
        _strip_frame(packed_params), cfg, past_hidden, first_embed,
        jax.random.PRNGKey(5), bs)
    codes_frame, sum_frame = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed,
        jax.random.PRNGKey(5), bs)
    assert (codes_ref == codes_frame).all(), f"{codes_ref}\n{codes_frame}"
    err = jnp.max(jnp.abs(sum_ref.astype(jnp.float32)
                          - sum_frame.astype(jnp.float32)))
    assert err < 0.15, err

    # broadcast(static) == static specialization
    static = SamplingConfig(do_sample=True, top_k=7, temperature=0.9)
    c_static, _ = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed,
        jax.random.PRNGKey(9), static)
    c_bcast, _ = code_predictor_generate(
        packed_params, cfg, past_hidden, first_embed,
        jax.random.PRNGKey(9), BatchedSampling.broadcast(static, b))
    assert (c_static == c_bcast).all()
