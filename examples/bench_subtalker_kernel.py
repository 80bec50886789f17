"""Microbenchmark: code-predictor (sub-talker) loop, XLA path vs the fused
Pallas micro-step kernel (ops/subtalker_step.py), on real TPU hardware.

The sub-talker runs 15 sequential 5-layer micro-forwards per audio frame
(reference modeling_qwen3_tts.py:1670-1686); it is the dominant per-frame
cost after int8 quantization of the talker stack. This script times the
full `talker_decode_step` (talker + sub-talker) and the isolated
`code_predictor_generate` in both modes.

Usage:  python examples/bench_subtalker_kernel.py [batch ...]

Measured (1x TPU v5e, this script, 32-frame fori_loop, best of 3):
  b=1   cp-only   xla-int8  3.244 ms/frame   pallas  3.073 ms/frame
  b=1   full-step xla-int8  6.502 ms/frame   pallas  6.396 ms/frame
  b=32  cp-only   xla-int8  5.004 ms/frame   pallas  4.090 ms/frame (-18%)
  b=32  full-step xla-int8 20.650 ms/frame   pallas 19.758 ms/frame
The kernel streams the full predictor stack (75 MB int8) per micro-step at
the DMA floor, but 16 separate pallas dispatches per frame plus the XLA-side
lm_head/sampling glue leave ~2x headroom (b=1) vs the 1.4 ms bandwidth
bound; a single-dispatch megakernel (lm_heads + gumbel-top-k sampling
in-kernel) is the identified next step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3_tts_tpu.models.presets import talker_1p7b
from qwen3_tts_tpu.models.talker import (
    TalkerState, code_predictor_generate, fuse_talker_params, init_talker_params,
    pack_talker_params, quantize_talker_params, talker_decode_step, talker_spec)
from qwen3_tts_tpu.nn.cache import KVCache
from qwen3_tts_tpu.nn.sampling import SamplingConfig, make_suppress_mask


def _params_like(init_fn, *args, dtype):
    shapes = jax.eval_shape(lambda: init_fn(jax.random.PRNGKey(0), *args, dtype))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def bench_cp(params, cfg, batch, steps=32, label=""):
    dtype = jnp.bfloat16
    samp = SamplingConfig()

    @jax.jit
    def run(params, key):
        def body(i, carry):
            h, k = carry
            k, sub = jax.random.split(k)
            codes, es = code_predictor_generate(params, cfg, h, h, sub, samp)
            return (h + es * 0, k)
        return jax.lax.fori_loop(0, steps, body,
                                 (jnp.zeros((batch, cfg.hidden_size), dtype), key))[0]

    float(run(params, jax.random.PRNGKey(0))[0, 0])
    best = None
    for seed in (11, 22, 33):
        t0 = time.perf_counter()
        _ = float(run(params, jax.random.PRNGKey(seed))[0, 0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = best / steps * 1e3
    print(f"  cp-only  {label:8s} b={batch:<3d} {ms:7.3f} ms/frame")
    return ms


def bench_step(params, cfg, batch, steps=32, cache_len=512, label=""):
    spec = talker_spec(cfg)
    dtype = jnp.bfloat16
    cache = KVCache.create(spec.num_layers, batch, cache_len, spec.num_kv_heads,
                           spec.head_dim, dtype=dtype)
    cache = cache._replace(index=jnp.asarray(64, jnp.int32))
    state = TalkerState(
        cache=cache,
        token0=jnp.zeros((batch,), jnp.int32),
        past_hidden=jnp.zeros((batch, cfg.hidden_size), dtype),
        seen=jnp.zeros((batch, cfg.vocab_size), bool),
        done=jnp.zeros((batch,), bool),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((batch,), jnp.int32),
        num_pads=jnp.zeros((batch,), jnp.int32),
    )
    trailing = jnp.zeros((batch, 32, cfg.hidden_size), dtype)
    pad_embed = jnp.zeros((1, cfg.hidden_size), dtype)
    pad_mask = jnp.ones((batch, cache_len), jnp.int32)
    suppress = make_suppress_mask(cfg.vocab_size, 1024, (cfg.codec_eos_token_id,))
    samp = SamplingConfig()

    @jax.jit
    def run(params, state):
        def body(_, s):
            s, _, _ = talker_decode_step(params, cfg, s, trailing, pad_embed,
                                         pad_mask, samp, samp, suppress)
            return s
        return jax.lax.fori_loop(0, steps, body, state)

    int(run(params, state).step[0])
    best = None
    for seed in (11, 22, 33):
        st = state._replace(key=jax.random.PRNGKey(seed))
        t0 = time.perf_counter()
        out = run(params, st)
        _ = int(out.step[0]) + int(out.token0[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = best / steps * 1e3
    print(f"  full-step {label:8s} b={batch:<3d} {ms:7.3f} ms/frame "
          f"({batch / (best / steps) / 12.5:.1f}x RT aggregate)")
    return ms


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 32]
    cfg = talker_1p7b()
    print(f"device: {jax.devices()[0]}")
    params = _params_like(init_talker_params, cfg, dtype=jnp.bfloat16)
    params = jax.jit(fuse_talker_params)(params)
    params_q = jax.jit(quantize_talker_params)(params)
    params_qp = pack_talker_params(params_q)
    for b in batches:
        bench_cp(params_q, cfg, b, label="xla-int8")
        bench_cp(params_qp, cfg, b, label="pallas")
        bench_step(params_q, cfg, b, label="xla-int8")
        bench_step(params_qp, cfg, b, label="pallas")


if __name__ == "__main__":
    main()
