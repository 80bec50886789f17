"""Probe: achievable HBM bandwidth + matmul layout effects on this v5e.

Decides the vocoder optimization direction: if a plain elementwise pass
only sustains ~250-300 GB/s, every conv strategy is capped by passes over
the activation, and the only lever is fewer passes (fusion); if copies run
at ~700+ GB/s, the conv/matmul lowering itself is the problem.

Usage: python examples/bench_membw.py
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

ITERS = 8


def timed(f, x, tag, bytes_per_iter=None, flops_per_iter=None):
    try:
        float(jnp.asarray(f(x)).reshape(-1)[0])
    except Exception as e:
        print(f"    {tag:24s}: failed {type(e).__name__}: {e}", flush=True)
        return

    def once(i):
        t0 = time.perf_counter()
        _ = float(jnp.asarray(f(x + jnp.bfloat16(i))).reshape(-1)[0])
        return time.perf_counter() - t0

    dt = min(once(i) for i in (1, 2, 3)) / ITERS
    extra = ""
    if bytes_per_iter:
        extra += f"  {bytes_per_iter/dt/1e9:6.0f} GB/s"
    if flops_per_iter:
        extra += f"  {flops_per_iter/dt/1e12:6.1f} TFLOP/s"
    print(f"    {tag:24s}: {dt*1e3:8.2f} ms{extra}", flush=True)


def main():
    print(f"device={jax.devices()[0]} iters={ITERS}", flush=True)
    key = jax.random.PRNGKey(0)

    # --- elementwise pass bandwidth at the block-4 activation size --------
    for shape, tag in (((16, 576000, 96), "ew (16,576000,96)"),
                       ((2304000, 384), "ew (2.3M,384) 2d"),
                       ((1152, 768, 1024), "ew (1152,768,1024)")):
        x = (jax.random.normal(key, shape) * 0.1).astype(jnp.bfloat16)
        n_bytes = x.size * 2 * 2  # read + write

        def run(a):
            def body(i, h):
                return h * jnp.bfloat16(0.999) + jnp.bfloat16(1e-6)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, body, a).reshape(-1)[:64])
        timed(jax.jit(run), x, tag, bytes_per_iter=n_bytes)
        del x

    # --- matmul layout effects at the b4-fold6 shape ----------------------
    m, k, n = 1152000, 576, 576  # b=16 equivalent
    w = (jax.random.normal(key, (k, n)) * 0.05).astype(jnp.bfloat16)
    for (shape, eq, tag) in (
            ((m, k), "mk,kn->mn", "mm 2d"),
            ((16, m // 16, k), "bsk,kn->bsn", "mm batched"),
    ):
        x = (jax.random.normal(key, shape) * 0.1).astype(jnp.bfloat16)

        def run(a, eq=eq):
            def body(i, h):
                return jnp.einsum(eq, h, w, preferred_element_type=jnp.bfloat16)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, body, a).reshape(-1)[:64])
        timed(jax.jit(run), x, tag,
              bytes_per_iter=2 * 2 * m * k, flops_per_iter=2.0 * m * k * n)
        del x

    # f32 accumulate-out variant
    x = (jax.random.normal(key, (m, k)) * 0.1).astype(jnp.bfloat16)

    def run_f32(a):
        def body(i, h):
            y = jnp.einsum("mk,kn->mn", h, w, preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x).reshape(-1)[:64])
    timed(jax.jit(run_f32), x, "mm 2d f32-acc",
          bytes_per_iter=2 * 2 * m * k, flops_per_iter=2.0 * m * k * n)

    # big-K reference: how fast CAN this chip matmul (weights resident)
    m2, k2, n2 = 131072, 4096, 4096
    w2 = (jax.random.normal(key, (k2, n2)) * 0.05).astype(jnp.bfloat16)
    x2 = (jax.random.normal(key, (m2, k2)) * 0.1).astype(jnp.bfloat16)

    def run_big(a):
        def body(i, h):
            return jnp.einsum("mk,kn->mn", h, w2,
                              preferred_element_type=jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, a).reshape(-1)[:64])
    timed(jax.jit(run_big), x2, "mm big (128k,4096,4096)",
          flops_per_iter=2.0 * m2 * k2 * n2)


if __name__ == "__main__":
    main()
