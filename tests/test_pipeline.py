"""Pipeline-parallel talker stack: shard_map+ppermute GPipe rotation must
reproduce the single-device `stack_forward` exactly, for forward, loss, and
gradients, including composed with data parallelism.

The reference only declares a pp_plan (configuration_qwen3_tts.py:181-185,
never executed); `parallel/pipeline.py` is the executable equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen3_tts_tpu.config import TalkerConfig
from qwen3_tts_tpu.models.presets import tiny_talker
from qwen3_tts_tpu.models.talker import init_talker_params, talker_spec
from qwen3_tts_tpu.nn.attention import make_prefill_mask
from qwen3_tts_tpu.nn.rope import make_inv_freq, rope_cos_sin
from qwen3_tts_tpu.nn.transformer import stack_forward
from qwen3_tts_tpu.parallel.pipeline import (make_train_step_pp,
                                             pipeline_param_specs,
                                             pipeline_stack_forward)
from qwen3_tts_tpu.parallel.sharding import shard_params


def _tiny4() -> TalkerConfig:
    """tiny_talker with a 4-layer stack so it splits over 4 stages."""
    import dataclasses
    return dataclasses.replace(tiny_talker(), num_hidden_layers=4)


def _pipe_mesh(num_stages: int, data: int = 1) -> Mesh:
    devs = np.asarray(jax.devices()[: num_stages * data])
    if data > 1:
        return Mesh(devs.reshape(data, num_stages), ("data", "pipe"))
    return Mesh(devs.reshape(num_stages), ("pipe",))


def _inputs(cfg, b, t, seed=0):
    spec = talker_spec(cfg)
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (b, t, cfg.hidden_size), jnp.float32) * 0.3
    am = jnp.ones((b, t), jnp.int32)
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_cos_sin(pos, inv, x.dtype)
    mask = make_prefill_mask(am, t, spec.sliding_window)
    return spec, x, cos, sin, mask


@pytest.mark.parametrize("num_stages,micro", [(2, 4), (4, 2)])
def test_pipeline_forward_matches_stack_forward(num_stages, micro):
    cfg = _tiny4()
    spec, x, cos, sin, mask = _inputs(cfg, b=8, t=10)
    params = init_talker_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    layers = params["layers"]

    ref, _ = stack_forward(spec, layers, x, cos, sin, mask, None)

    mesh = _pipe_mesh(num_stages)
    specs = pipeline_param_specs(params)
    layers_pp = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        layers, specs["layers"])
    with mesh:
        got = pipeline_stack_forward(spec, layers_pp, x, cos, sin, mask, mesh,
                                     num_microbatches=micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_stage_count_must_divide_layers():
    cfg = _tiny4()
    spec, x, cos, sin, mask = _inputs(cfg, b=4, t=6)
    params = init_talker_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    mesh = _pipe_mesh(3)
    with pytest.raises(ValueError, match="pipeline stages"):
        pipeline_stack_forward(spec, params["layers"], x, cos, sin, mask,
                               mesh, num_microbatches=2)


def _sft_batch(cfg, b, t, seed=0):
    from qwen3_tts_tpu.finetune.sft import SFTBatch
    rng = np.random.RandomState(seed)
    codec_ids = rng.randint(0, cfg.code_predictor.vocab_size, size=(b, t, 4))
    codec_ids[..., 0] = rng.randint(0, 1024, size=(b, t))
    codec_mask = np.zeros((b, t), bool)
    codec_mask[:, t // 2:] = True
    labels = np.where(codec_mask, codec_ids[..., 0], -100)
    return SFTBatch(
        input_ids=jnp.asarray(rng.randint(0, 200, size=(b, t, 2))),
        codec_ids=jnp.asarray(codec_ids),
        text_embedding_mask=jnp.asarray(~codec_mask[..., None]).astype(jnp.float32),
        codec_embedding_mask=jnp.asarray(np.ones((b, t, 1), np.float32)),
        attention_mask=jnp.ones((b, t), jnp.int32),
        codec_0_labels=jnp.asarray(labels),
        codec_mask=jnp.asarray(codec_mask),
        speaker_embedding=jnp.asarray(rng.randn(b, cfg.hidden_size).astype(np.float32)),
    )


@pytest.mark.parametrize("data,num_stages", [(1, 2), (2, 2)])
def test_pp_train_step_matches_plain(data, num_stages):
    """One PP(xDP) SFT step must produce the same loss AND updated params as
    the plain single-device step (same math, re-ordered schedule)."""
    from qwen3_tts_tpu.finetune.sft import default_optimizer, make_train_step

    cfg = _tiny4()
    b, t = 8, 12
    params = init_talker_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    batch = _sft_batch(cfg, b, t)
    opt = default_optimizer()

    ref_step = jax.jit(make_train_step(cfg, opt))
    ref_params, _, ref_loss = ref_step(params, opt.init(params), batch)

    mesh = _pipe_mesh(num_stages, data=data)
    data_axis = "data" if data > 1 else None
    pp_specs = pipeline_param_specs(params)
    params_pp = shard_params(params, mesh, pp_specs)
    if data_axis:
        batch = jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P("data", *[None] * (a.ndim - 1)))),
            batch)
    step = jax.jit(make_train_step_pp(cfg, opt, mesh,
                                      num_microbatches=4,
                                      data_axis=data_axis))
    with mesh:
        new_params, _, loss = step(params_pp, opt.init(params_pp), batch)
        loss.block_until_ready()

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=1e-6, atol=1e-7)
    flat_ref = jax.tree.leaves(ref_params)
    flat_got = jax.tree.leaves(new_params)
    assert len(flat_ref) == len(flat_got)
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-6)
