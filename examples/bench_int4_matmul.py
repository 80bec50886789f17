"""Which int4 dequant formulation does XLA fuse into the matmul operand?

Phase-E finding (r4): the shipped `_dequant4` (adjacent-nibble interleave
via stack+reshape) measures 30.9 ms at b=1 / 43.4 ms at b=80 for the full
decode step — far above the int8 path (5.5 / 13.7 ms). The interleave
defeats XLA's operand fusion and the dequantized bf16 weights materialize.

Candidates, all measured amortized (ITERS chained applications inside ONE
jit; finding #1 in NOTES.md — never time a single dispatch):

  A. int8 reference: w_q.astype(bf16) * s      (known-fused baseline)
  B. adjacent interleave (current _dequant4)
  C. half-split two-matmul, group scales via (G,128,O) reshape-mul
  D. half-split two-matmul, per-out-channel scales only (no groups)

Shapes: the gate_up matmul (2048 -> 12288) and the full-layer proxy.
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

ITERS = 256  # per-apply cost is ~0.1 ms; the 25-100 ms RPC dispatch floor
             # needs hundreds of chained applies to amortize (finding #1)
IN, OUT = 2048, 12288
G = 128  # group size


def _mk(key, b):
    kw, ks, kh = jax.random.split(key, 3)
    q = jax.random.randint(kw, (IN // 2, OUT), 0, 255, jnp.int32).astype(jnp.uint8)
    s = (jax.random.uniform(ks, (IN // G, OUT)) * 0.01 + 0.001).astype(jnp.bfloat16)
    h = jax.random.normal(kh, (b, IN), jnp.bfloat16)
    w8 = jax.random.randint(kw, (IN, OUT), -127, 127, jnp.int32).astype(jnp.int8)
    s8 = s[:1]
    return q, s, h, w8, s8


def m_int8(h, w8, s8):
    return jnp.dot(h, w8.astype(jnp.bfloat16) * s8, preferred_element_type=jnp.float32)


def m_interleave(h, q, s):
    lo = (q & jnp.uint8(0x0F)).astype(jnp.int8) - 8
    hi = (q >> jnp.uint8(4)).astype(jnp.int8) - 8
    full = jnp.stack([lo, hi], axis=-2).reshape(IN, OUT)
    ng = IN // G
    w = (full.astype(jnp.bfloat16).reshape(ng, G, OUT) * s[:, None, :]).reshape(IN, OUT)
    return jnp.dot(h, w, preferred_element_type=jnp.float32)


def m_halfsplit_group(h, q, s):
    half = IN // 2
    ng2 = half // G
    out = jnp.zeros((h.shape[0], OUT), jnp.float32)
    for part, h_sl, s_sl in (
        ((q & jnp.uint8(0x0F)), h[:, :half], s[:ng2]),
        ((q >> jnp.uint8(4)), h[:, half:], s[ng2:]),
    ):
        w = (part.astype(jnp.int8) - 8).astype(jnp.bfloat16)
        w = (w.reshape(ng2, G, OUT) * s_sl[:, None, :]).reshape(half, OUT)
        out = out + jnp.dot(h_sl, w, preferred_element_type=jnp.float32)
    return out


def m_halfsplit_rowscale(h, q, s):
    half = IN // 2
    srow = s[:1]  # (1, OUT) — per-out-channel only
    out = jnp.zeros((h.shape[0], OUT), jnp.float32)
    for part, h_sl in (((q & jnp.uint8(0x0F)), h[:, :half]),
                       ((q >> jnp.uint8(4)), h[:, half:])):
        w = ((part.astype(jnp.int8) - 8).astype(jnp.bfloat16)) * srow
        out = out + jnp.dot(h_sl, w, preferred_element_type=jnp.float32)
    return out


def bench(name, fn, args, h):
    @jax.jit
    def run(h, *args):
        def body(i, acc):
            y = fn(acc[:, :IN], *args)
            return (acc + y[:, :IN] * 1e-6).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, h)

    r = run(h, *args)
    float(r[0, 0])
    dts = []
    for i in (1, 2, 3):
        h2 = h + jnp.bfloat16(i * 1e-3)
        t0 = time.perf_counter()
        float(run(h2, *args)[0, 0])
        dts.append(time.perf_counter() - t0)
    dt = min(dts) / ITERS
    wbytes = IN * OUT // 2 if fn is not m_int8 else IN * OUT
    gbs = wbytes / dt / 1e9
    print(f"  {name:28s} {dt * 1e3:8.3f} ms/apply  ({gbs:6.1f} GB/s weight stream)",
          flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0]}  IN={IN} OUT={OUT} ITERS={ITERS}", flush=True)
    for b in (1, 80):
        print(f"-- batch {b}", flush=True)
        q, s, h, w8, s8 = _mk(jax.random.PRNGKey(0), b)
        bench("A int8 rowscale (ref)", m_int8, (w8, s8), h)
        bench("B adjacent interleave", m_interleave, (q, s), h)
        bench("C half-split group", m_halfsplit_group, (q, s), h)
        bench("D half-split rowscale", m_halfsplit_rowscale, (q, s), h)


if __name__ == "__main__":
    main()
