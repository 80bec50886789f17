"""Amortized microbenchmark: SEANet conv strategies with dispatch overhead
amortized (ITERS chained applications inside ONE jit call).

bench_seanet_conv.py (and r3's bench_conv1d.py) timed one dispatch per
measurement; on the RPC-tunneled TPU a dispatch+fetch costs ~25 ms, which
swamped every conv under ~50 ms and made convlib look like 10-60 TFLOP/s.
Here each timed call runs ITERS conv applications chained output->input
(C_in == C_out for all unit convs), so per-conv = dt/ITERS with the floor
amortized to ~3 ms/8.

Also measures a pure-matmul baseline at each fold's (M, K, N) so the folded
formulation's achievable ceiling is known, plus the dispatch floor itself.

Usage: python examples/bench_seanet_conv2.py [block1|block2|block3|block4|mm|tconv]
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
                                   folded_causal_conv1d, _fold_kernel,
                                   phased_causal_transconv1d)

ITERS = 8


def timed(f, x, tag, flops_per_iter):
    try:
        jax.block_until_ready(f(x))
        r = f(x)
        float(jnp.asarray(r).reshape(-1)[0])
    except Exception as e:
        print(f"    {tag:12s}: failed {type(e).__name__}: {e}", flush=True)
        return None

    def once(i):
        t0 = time.perf_counter()
        _ = float(jnp.asarray(f(x + jnp.bfloat16(i * 1e-3))).reshape(-1)[0])
        return time.perf_counter() - t0

    dt = min(once(i) for i in (1, 2, 3)) / ITERS
    print(f"    {tag:12s}: {dt*1e3:9.2f} ms/conv  "
          f"({flops_per_iter/dt/1e12:6.1f} TFLOP/s true)", flush=True)
    return dt


def chain(conv_fn):
    """ITERS chained applications, output feeding input (jit once)."""
    def run(x):
        def body(i, a):
            return conv_fn(a) * jnp.bfloat16(0.5) + a * jnp.bfloat16(0.01)
        y = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(y[:, :64], axis=(1, 2))
    return jax.jit(run)


def bench_block(t, c, b):
    key = jax.random.PRNGKey(0)
    w7 = (jax.random.normal(key, (7, c, c)) * 0.05).astype(jnp.bfloat16)
    w1 = (jax.random.normal(key, (1, c, c)) * 0.05).astype(jnp.bfloat16)
    x = (jax.random.normal(key, (b, t, c)) * 0.1).astype(jnp.bfloat16)
    f7 = 2.0 * b * t * 7 * c * c
    f1 = 2.0 * b * t * c * c
    for d in (1, 3, 9):
        print(f"  unit k7 T={t} C={c} b={b} d={d}", flush=True)
        timed(chain(lambda a, d=d: causal_conv1d(a, w7, dilation=d)), x,
              "convlib", f7)
        for fold in (6, 8):
            timed(chain(lambda a, d=d, fold=fold: folded_causal_conv1d(
                a, w7, dilation=d, fold=fold)), x, f"fold{fold}", f7)
    print(f"  unit k1 T={t} C={c} b={b}", flush=True)
    timed(chain(lambda a: causal_conv1d(a, w1)), x, "convlib", f1)
    timed(chain(lambda a: folded_causal_conv1d(a, w1, fold=8)), x, "fold8", f1)
    del x


def bench_mm():
    """Pure matmul ceiling at the folded shapes (M, K, N) = (B*T/W, W*C, W*C)."""
    key = jax.random.PRNGKey(1)
    for (m, k, n, tag) in ((2304000, 576, 576, "b4 fold6"),
                           (2304000, 768, 768, "b4 fold8"),
                           (768000, 1152, 1152, "b3 fold6"),
                           (192000, 2304, 2304, "b2 fold6"),
                           (38400, 4608, 4608, "b1 fold6"),
                           (18432000, 96, 96, "b4 raw"),
                           (18432000, 672, 96, "b4 im2col")):
        x = (jax.random.normal(key, (m, k)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (k, n)) * 0.05).astype(jnp.bfloat16)

        def run(a, w=w):
            def body(i, h):
                y = jnp.einsum("mk,kn->mn", h, w,
                               preferred_element_type=jnp.bfloat16)
                return y[:, : a.shape[1]] if y.shape[1] >= a.shape[1] else jnp.pad(
                    y, ((0, 0), (0, a.shape[1] - y.shape[1])))
            h = jax.lax.fori_loop(0, ITERS, body, a)
            return jnp.sum(h[:64, :64])
        f = jax.jit(run)
        print(f"  mm {tag} M={m} K={k} N={n}", flush=True)
        timed(f, x, "einsum", 2.0 * m * k * n)
        del x, w


def bench_tconv():
    key = jax.random.PRNGKey(2)
    for (t, cin, cout, s, b) in ((1200, 1536, 768, 8, 32),
                                 (9600, 768, 384, 5, 32),
                                 (48000, 384, 192, 4, 32),
                                 (192000, 192, 96, 3, 16)):
        k = 2 * s
        x = (jax.random.normal(key, (b, t, cin)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (k, cout, cin)) * 0.05).astype(jnp.bfloat16)
        # chain needs C_in==C_out; tconv changes both C and T, so chain a
        # fixed per-iter pair: tconv then a strided channel-doubling slice
        # back to the input shape (cheap reshape-ish ops, costed below).
        def run(a, w=w, s=s):
            def body(i, h):
                y = causal_transconv1d(h, w, stride=s)        # (b, ~t*s, cout)
                return y[:, :t * s:s].repeat(2, axis=-1)[:, :, :cin] * jnp.bfloat16(0.5)
            h = jax.lax.fori_loop(0, ITERS, body, a)
            return jnp.sum(h[:, :64], axis=(1, 2))

        def run_phased(a, w=w, s=s):
            def body(i, h):
                y = phased_causal_transconv1d(h, w, stride=s)
                return y[:, :t * s:s].repeat(2, axis=-1)[:, :, :cin] * jnp.bfloat16(0.5)
            h = jax.lax.fori_loop(0, ITERS, body, a)
            return jnp.sum(h[:, :64], axis=(1, 2))
        flops = 2.0 * b * t * k * cin * cout
        print(f"  tconv T={t} {cin}->{cout} k={k} s={s} b={b}", flush=True)
        timed(jax.jit(run), x, "convlib", flops)
        timed(jax.jit(run_phased), x, "phased", flops)
        del x


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device={jax.devices()[0]} iters={ITERS}", flush=True)
    # dispatch floor
    xf = jnp.ones((8, 8), jnp.bfloat16)
    f0 = jax.jit(lambda a: jnp.sum(a))
    float(f0(xf))
    t0 = time.perf_counter()
    for i in range(5):
        float(f0(xf + jnp.bfloat16(i)))
    print(f"  dispatch floor ~{(time.perf_counter()-t0)/5*1e3:.1f} ms/call",
          flush=True)

    blocks = {"block1": (9600, 768, 32), "block2": (48000, 384, 32),
              "block3": (192000, 192, 32), "block4": (576000, 96, 16)}
    if which in blocks:
        bench_block(*blocks[which])
    elif which == "mm":
        bench_mm()
    elif which == "tconv":
        bench_tconv()
    else:
        for name in ("block4", "block3", "block2", "block1"):
            bench_block(*blocks[name])
        bench_mm()
        bench_tconv()


if __name__ == "__main__":
    main()
