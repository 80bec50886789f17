"""Probe: does ANY int4 unpack formulation fuse into the matmul operand
read under XLA:TPU? Times a decode-shaped weight-streaming matmul
(b=1, 2048 -> 6144) per container/unpack variant, amortized over ITERS
weights inside one jit call (each weight read once — models the decode
step's weight stream; the metric is effective GB/s of weight bytes).

Usage: python examples/bench_int4_unpack.py
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

L = 24           # distinct weights per call (amortizes dispatch)
CIN, COUT = 2048, 6144
B = 1


def timed(make, ws, tag, logical_bytes):
    f = jax.jit(make)
    x = jnp.ones((B, CIN), jnp.bfloat16)
    try:
        float(f(x, ws)[0, 0])
    except Exception as e:
        print(f"    {tag:16s}: failed {type(e).__name__}: {e}", flush=True)
        return

    def once(i):
        t0 = time.perf_counter()
        _ = float(f(x + jnp.bfloat16(i * 1e-3), ws)[0, 0])
        return time.perf_counter() - t0

    dt = min(once(i) for i in (1, 2, 3)) / L
    print(f"    {tag:16s}: {dt*1e3:8.3f} ms/weight  "
          f"({logical_bytes/dt/1e9:6.0f} GB/s of stored bytes)", flush=True)


def main():
    print(f"device={jax.devices()[0]} L={L} shape=({CIN},{COUT})", flush=True)
    key = jax.random.PRNGKey(0)
    wf = jax.random.normal(key, (L, CIN, COUT)) * 0.02
    s8 = jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 127.0
    q8 = jnp.clip(jnp.round(wf / s8), -127, 127).astype(jnp.int8)
    s8 = s8.astype(jnp.bfloat16)
    # group-128 int4
    G = 128
    wg = wf.reshape(L, CIN // G, G, COUT)
    s4 = (jnp.max(jnp.abs(wg), axis=2, keepdims=True) / 7.0).astype(jnp.bfloat16)
    q4 = jnp.clip(jnp.round(wg / s4.astype(jnp.float32)), -7, 7).astype(jnp.int8)
    q4 = q4.reshape(L, CIN, COUT)
    b4 = (q4 + 8).astype(jnp.uint8)
    pk_il = b4[:, 0::2] | (b4[:, 1::2] << jnp.uint8(4))     # interleaved rows
    pk_hv = b4[:, :CIN // 2] | (b4[:, CIN // 2:] << jnp.uint8(4))  # half split
    s4c = s4[:, :, 0, :]  # (L, CIN/G, COUT)
    wb = wf.astype(jnp.bfloat16)

    def scan_mm(dequant):
        def run(x, ws):
            def body(acc, w):
                y = jnp.dot(x, dequant(w), preferred_element_type=jnp.float32)
                return acc + y.astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((B, COUT), jnp.float32), ws)
            return acc
        return run

    timed(scan_mm(lambda w: w), wb, "bf16", CIN * COUT * 2)
    timed(scan_mm(lambda w: (w[0].astype(jnp.bfloat16) * w[1])),
          (q8, s8), "int8", CIN * COUT)

    def deq_stack(w):
        pk, s = w
        lo = (pk & jnp.uint8(15)).astype(jnp.int8) - 8
        hi = (pk >> jnp.uint8(4)).astype(jnp.int8) - 8
        full = jnp.stack([lo, hi], axis=1).reshape(CIN, COUT)
        fullg = full.reshape(CIN // G, G, COUT).astype(jnp.bfloat16)
        return (fullg * s[:, None, :]).reshape(CIN, COUT)
    timed(scan_mm(deq_stack), (pk_il, s4c), "int4 stack", CIN * COUT // 2)

    def deq_select(w):
        pk, s = w
        lo = (pk & jnp.uint8(15)).astype(jnp.int8) - 8
        hi = (pk >> jnp.uint8(4)).astype(jnp.int8) - 8
        sel = jax.lax.broadcasted_iota(jnp.int32, (CIN // 2, 2, COUT), 1)
        full = jnp.where(sel == 0, lo[:, None, :], hi[:, None, :])
        full = full.reshape(CIN, COUT)
        fullg = full.reshape(CIN // G, G, COUT).astype(jnp.bfloat16)
        return (fullg * s[:, None, :]).reshape(CIN, COUT)
    timed(scan_mm(deq_select), (pk_il, s4c), "int4 select", CIN * COUT // 2)

    def run_split(x, ws):
        pk, s = ws

        def body(acc, w):
            pkw, sw = w
            lo = ((pkw & jnp.uint8(15)).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            hi = ((pkw >> jnp.uint8(4)).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            h = CIN // 2
            lo = (lo.reshape(h // G, G, COUT)
                  * sw[: h // G, None, :]).reshape(h, COUT)
            hi = (hi.reshape(h // G, G, COUT)
                  * sw[h // G:, None, :]).reshape(h, COUT)
            y = (jnp.dot(x[:, :h], lo, preferred_element_type=jnp.float32)
                 + jnp.dot(x[:, h:], hi, preferred_element_type=jnp.float32))
            return acc + y, None
        acc, _ = jax.lax.scan(body, jnp.zeros((B, COUT), jnp.float32),
                              (pk, s))
        return acc
    timed(run_split, (pk_hv, s4c), "int4 halfsplit", CIN * COUT // 2)


if __name__ == "__main__":
    main()
