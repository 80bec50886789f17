"""Microbenchmark: 1D conv strategies at the vocoder's SEANet shapes.

r3 finding: the SEANet stack runs at <1% MFU through
`lax.conv_general_dilated` in NWC (block2's ~85 GFLOP took 362 ms at b=32
— 8x off even the bandwidth roofline). Candidates:

  convlib   lax.conv_general_dilated NWC (current)
  matmul    sum over taps of shifted (B*T, Cin) @ (Cin, Cout) dots
  nhwc      reshape to (B, 1, T, C) and run a 2D NHWC conv

Usage: python examples/bench_conv1d.py
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


def conv_lib(x, w, dilation):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[((w.shape[0] - 1) * dilation, 0)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def conv_matmul(x, w, dilation):
    """Causal k-tap conv as k shifted matmuls (accumulated in f32)."""
    k = w.shape[0]
    b, t, cin = x.shape
    pad = (k - 1) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    acc = None
    for tap in range(k):
        seg = jax.lax.dynamic_slice_in_dim(xp, tap * dilation, t, axis=1)
        y = jnp.einsum("btc,cd->btd", seg, w[tap],
                       preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


def conv_nhwc(x, w, dilation):
    y = jax.lax.conv_general_dilated(
        x[:, None], w[None], window_strides=(1, 1),
        padding=[(0, 0), ((w.shape[0] - 1) * dilation, 0)],
        rhs_dilation=(1, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y[:, 0]


def bench(fn, x, w, dilation, tag):
    f = jax.jit(lambda a: jnp.sum(fn(a, w, dilation), axis=(1, 2)))
    float(f(x)[0])

    def once(i):
        t0 = time.perf_counter()
        _ = float(f(x + jnp.bfloat16(i * 1e-3))[0])
        return time.perf_counter() - t0

    dt = min(once(i) for i in (1, 2, 3))
    flops = 2 * x.shape[0] * x.shape[1] * x.shape[2] * w.shape[2] * w.shape[0]
    print(f"    {tag:8s}: {dt*1e3:9.2f} ms  ({flops/dt/1e12:6.2f} TFLOP/s)",
          flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    for (b, t, c, k, dil) in ((32, 192000, 96, 7, 3),
                              (32, 48000, 192, 7, 9),
                              (32, 576000, 48, 7, 1)):
        x = (jax.random.normal(key, (b, t, c)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (k, c, c if t != 576000 else c)) * 0.05
             ).astype(jnp.bfloat16)
        print(f"  shape b={b} t={t} c={c} k={k} dil={dil}", flush=True)
        for fn, tag in ((conv_lib, "convlib"), (conv_matmul, "matmul"),
                        (conv_nhwc, "nhwc")):
            try:
                bench(fn, x, w, dil, tag)
            except Exception as e:
                print(f"    {tag}: failed {e!r}", flush=True)


if __name__ == "__main__":
    main()
