"""Measure cold/warm compile + step time of the layer-pair fused talker-step
kernel (ops/talker_step_loop.py) at the serving geometry on real hardware.

Round-2 finding (NOTES.md): the fully-unrolled 28-layer kernel cold-compiles
for tens of minutes under Mosaic. The loop kernel cuts the IR ~14x; this
script quantifies the compile-time win and the per-step cost so the serving
default can be chosen on evidence.

Usage:  python examples/bench_step_loop_compile.py [batch] [cache_len]
        python examples/bench_step_loop_compile.py --check-parity [batch] [cache_len]

--check-parity runs the rolled (fori_loop) and unrolled step kernels on the
same weights/state on the DEVICE and asserts output closeness — the hardware
counterpart of tests/test_talker_step_loop.py's interpret-mode parity (r2
advice: the bench script previously measured time only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def check_parity(batch: int, cache_len: int):
    """Rolled vs unrolled step kernel on identical weights/state, on device."""
    from qwen3_tts_tpu.nn.cache import KVCache
    from qwen3_tts_tpu.nn.rope import make_inv_freq, rope_cos_sin
    from qwen3_tts_tpu.nn.transformer import (DecoderSpec, fuse_stack_params,
                                              init_stack_params,
                                              quantize_stack_params)
    from qwen3_tts_tpu.ops.talker_step import fused_talker_step
    from qwen3_tts_tpu.ops.talker_step_loop import fused_talker_step_loop

    L, H, NQ, NKV, D, INTER, V = 4, 1024, 8, 8, 128, 1024, 1024
    spec = DecoderSpec(hidden_size=H, intermediate_size=INTER, num_layers=L,
                       num_heads=NQ, num_kv_heads=NKV, head_dim=D, qk_norm=True)
    layers = quantize_stack_params(fuse_stack_params(
        init_stack_params(jax.random.PRNGKey(0), spec, jnp.bfloat16)))
    head = jax.random.normal(jax.random.PRNGKey(1), (H, V)) * 0.05
    hs = jnp.maximum(jnp.max(jnp.abs(head), axis=0, keepdims=True) / 127.0, 1e-8)
    head_q = jnp.clip(jnp.round(head / hs), -127, 127).astype(jnp.int8)
    head_s = hs.astype(jnp.bfloat16)

    kseed = jax.random.normal(jax.random.PRNGKey(7), (L, batch, cache_len, NKV, D)) * 0.2
    kc0, vc0 = kseed.astype(jnp.bfloat16), (kseed * 0.5).astype(jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(8), (batch, H)) * 0.3).astype(jnp.bfloat16)
    inv = make_inv_freq(D, spec.rope_theta)
    cos, sin = rope_cos_sin(jnp.full((batch, 1), 3, jnp.int32), inv, jnp.bfloat16)
    pad = jnp.ones((batch, cache_len), jnp.int32)
    idx = jnp.asarray(3, jnp.int32)

    outs = {}
    for tag, fn in (("rolled", fused_talker_step_loop),
                    ("unrolled", fused_talker_step)):
        h, logits, kc, vc = jax.jit(
            lambda kc, vc, fn=fn: fn(layers, layers["norm"], head_q, head_s, x,
                                     cos[:, 0], sin[:, 0], pad, idx, L,
                                     spec.rms_norm_eps, kc, vc))(kc0, vc0)
        outs[tag] = tuple(np.asarray(a, np.float32) for a in (h, logits, kc, vc))
    for name, a, b in zip(("hidden", "logits", "k", "v"),
                          outs["rolled"], outs["unrolled"]):
        np.testing.assert_allclose(a, b, atol=0.04, rtol=0.01,
                                   err_msg=f"{name} rolled != unrolled")
    print(f"parity OK (rolled == unrolled on device, b={batch} s={cache_len})",
          flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 32
    cache_len = int(args[1]) if len(args) > 1 else 512
    print(f"device={jax.devices()[0]} batch={batch} cache_len={cache_len}",
          flush=True)

    if "--check-parity" in sys.argv:
        check_parity(min(batch, 8), min(cache_len, 128))
        return

    t0 = time.time()
    fps, ms = bench.bench_talker(batch=batch, cache_len=cache_len, steps=64,
                                 quantize=True, packed=True, step_kernel=True)
    t1 = time.time()
    print(f"compile+warmup+measure: {t1 - t0:.1f}s  "
          f"step={ms * 1e3:.3f} ms  frames/s={fps:.1f}", flush=True)
    # measurement record ONLY — deliberately NOT the STEP_KERNEL_WARM_B{N}
    # marker bench.py gates on: Pallas cache keys are trace-order dependent
    # (NOTES.md), so an entry warmed by this side script can MISS from
    # bench.py and a marker written here could make a driver run eat a cold
    # Mosaic compile. Only bench.py itself writes the gating marker, after a
    # kernel phase succeeds inside bench.py's own trace order.
    with open(os.path.join(_CACHE_DIR,
                           f"STEP_KERNEL_MEASURED_B{batch}"), "w") as f:
        f.write(f"batch={batch} cache_len={cache_len} step_ms={ms * 1e3:.3f} "
                f"compile_s={t1 - t0:.1f}\n")


if __name__ == "__main__":
    main()
