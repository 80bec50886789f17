"""Microbenchmark: folded/phased conv formulations at the real SEANet
serving shapes (b=32, 300-frame chunk) on TPU.

r3 retired the Pallas SEANet-unit kernel after measuring the XLA conv path
faster at every block shape, but flagged (VERDICT r3 weak #2) that the
output-position-tiled matmul formulation — W consecutive output positions
per MXU call so lanes = C_out*W >= 128 — was never tried. This measures it:

  convlib  lax.conv_general_dilated NWC (current production path)
  fold8    folded_causal_conv1d fold=8  (2-tap matmul, lanes 8*C)
  fold16   folded_causal_conv1d fold=16 (lanes 16*C, 16/7x FLOP redundancy)
  tconv    causal_transconv1d (conv_transpose) vs phased (one-matmul) form

Usage: python examples/bench_seanet_conv.py [--fast]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3_tts_tpu.nn.conv import (causal_conv1d, causal_transconv1d,
                                   folded_causal_conv1d,
                                   phased_causal_transconv1d)

B = 32


def bench(make_fn, x, tag, flops):
    f = jax.jit(lambda a: jnp.sum(make_fn(a), axis=(1, 2)))
    try:
        float(f(x)[0])
    except Exception as e:
        print(f"    {tag:8s}: failed {type(e).__name__}: {e}", flush=True)
        return None

    def once(i):
        t0 = time.perf_counter()
        _ = float(f(x + jnp.bfloat16(i * 1e-3))[0])
        return time.perf_counter() - t0

    dt = min(once(i) for i in (1, 2, 3))
    print(f"    {tag:8s}: {dt*1e3:9.2f} ms  ({flops/dt/1e12:6.2f} TFLOP/s true)",
          flush=True)
    return dt


def main():
    fast = "--fast" in sys.argv
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    # residual-unit k7 convs at each block's (T, C) for d in (1, 3, 9)
    unit_shapes = [(9600, 768), (48000, 384), (192000, 192), (576000, 96)]
    if fast:
        unit_shapes = unit_shapes[2:]
    for (t, c) in unit_shapes:
        for d in (1, 3, 9):
            x = (jax.random.normal(key, (B, t, c)) * 0.1).astype(jnp.bfloat16)
            w = (jax.random.normal(key, (7, c, c)) * 0.05).astype(jnp.bfloat16)
            flops = 2.0 * B * t * 7 * c * c
            print(f"  unit k7 T={t} C={c} d={d}", flush=True)
            bench(lambda a, w=w, d=d: causal_conv1d(a, w, dilation=d), x,
                  "convlib", flops)
            bench(lambda a, w=w, d=d: folded_causal_conv1d(a, w, dilation=d,
                                                           fold=8), x,
                  "fold8", flops)
            if c <= 192:
                bench(lambda a, w=w, d=d: folded_causal_conv1d(
                    a, w, dilation=d, fold=16), x, "fold16", flops)
        # k1 conv (pointwise)
        x = (jax.random.normal(key, (B, t, c)) * 0.1).astype(jnp.bfloat16)
        w1 = (jax.random.normal(key, (1, c, c)) * 0.05).astype(jnp.bfloat16)
        flops = 2.0 * B * t * c * c
        print(f"  unit k1 T={t} C={c}", flush=True)
        bench(lambda a, w=w1: causal_conv1d(a, w), x, "convlib", flops)
        bench(lambda a, w=w1: folded_causal_conv1d(a, w, fold=8), x, "fold8",
              flops)

    # block transposed convs (K = 2*rate, stride rate, C -> C/2)
    tconv_shapes = [(1200, 1536, 768, 8), (9600, 768, 384, 5),
                    (48000, 384, 192, 4), (192000, 192, 96, 3)]
    if fast:
        tconv_shapes = tconv_shapes[2:]
    for (t, cin, cout, s) in tconv_shapes:
        k = 2 * s
        x = (jax.random.normal(key, (B, t, cin)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (k, cout, cin)) * 0.05).astype(jnp.bfloat16)
        flops = 2.0 * B * t * k * cin * cout
        print(f"  tconv T={t} {cin}->{cout} k={k} s={s}", flush=True)
        bench(lambda a, w=w, s=s: causal_transconv1d(a, w, stride=s), x,
              "convlib", flops)
        bench(lambda a, w=w, s=s: phased_causal_transconv1d(a, w, stride=s), x,
              "phased", flops)

    if not fast:
        # conv_in (k7, latent 1024 -> 1536, T=1200) and conv_out (96 -> 1)
        x = (jax.random.normal(key, (B, 1200, 1024)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (7, 1024, 1536)) * 0.05).astype(jnp.bfloat16)
        flops = 2.0 * B * 1200 * 7 * 1024 * 1536
        print("  conv_in k7 T=1200 1024->1536", flush=True)
        bench(lambda a, w=w: causal_conv1d(a, w), x, "convlib", flops)
        bench(lambda a, w=w: folded_causal_conv1d(a, w, fold=8), x, "fold8", flops)

        x = (jax.random.normal(key, (B, 576000, 96)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (7, 96, 1)) * 0.05).astype(jnp.bfloat16)
        flops = 2.0 * B * 576000 * 7 * 96
        print("  conv_out k7 T=576000 96->1", flush=True)
        bench(lambda a, w=w: causal_conv1d(a, w), x, "convlib", flops)
        for fold in (8, 16):
            bench(lambda a, w=w, fold=fold: folded_causal_conv1d(a, w, fold=fold),
                  x, f"fold{fold}", flops)


if __name__ == "__main__":
    main()
