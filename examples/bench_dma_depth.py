"""Probe: HBM read bandwidth vs number of outstanding async copies.

bench_membw's elementwise pass sustains ~350 GB/s READ + ~350 GB/s WRITE
(it counted r+w: ~700 GB/s total, ~85% of the 819 spec). The fused decode
kernels stream weights with a double-buffered pipeline that keeps only
~1-2 DMAs in flight — if a single in-flight stream caps at ~350 GB/s,
the kernels are leaving 2x on the table and the fix is pipeline DEPTH.

Methodology: the 25-100 ms RPC dispatch floor swamps a single pass
(finding #1 — the first edition of this probe measured "29 GB/s" of pure
floor), so each depth is measured as the DELTA between a many-pass and a
one-pass kernel over the same 0.5 GB stream: bw = extra_bytes / (t_n-t_1).

Usage (TPU): python examples/bench_dma_depth.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

IT, OT = 1024, 4096            # 4 MB int8 tiles
N_TILES = 128                  # 0.5 GB per pass


def _kernel(src_ref, o_ref, buf, sem, *, depth: int, passes: int):
    def dma(j, slot):
        return pltpu.make_async_copy(src_ref.at[j % N_TILES], buf.at[slot],
                                     sem.at[slot])

    total = N_TILES * passes
    for j in range(min(depth, total)):
        dma(j, j % depth).start()
    acc = jnp.zeros((8, OT), jnp.float32)
    for j in range(total):
        if j + depth < total:
            dma(j + depth, (j + depth) % depth).start()
        dma(j, j % depth).wait()
        # touch 8 rows so the copy cannot be elided
        acc = acc + buf[j % depth, :8].astype(jnp.float32)
    o_ref[:] = acc


def _timed(depth: int, passes: int, src):
    fn = jax.jit(pl.pallas_call(
        functools.partial(_kernel, depth=depth, passes=passes),
        out_shape=jax.ShapeDtypeStruct((8, OT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((depth, IT, OT), jnp.int8),
                        pltpu.SemaphoreType.DMA((depth,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(depth + 4) * IT * OT + (16 << 20)),
    ))
    np.asarray(fn(src))
    dts = []
    for i in (1, 2, 3):
        s2 = src + jnp.int8(i)
        s2.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fn(s2))
        dts.append(time.perf_counter() - t0)
    return min(dts)


def run(depth: int):
    src = jax.random.randint(jax.random.PRNGKey(0), (N_TILES, IT, OT),
                             -127, 127, jnp.int32).astype(jnp.int8)
    t1 = _timed(depth, 1, src)
    t9 = _timed(depth, 17, src)
    extra = 16 * N_TILES * IT * OT
    bw = extra / (t9 - t1) / 1e9
    print(f"  depth={depth}:  t1={t1*1e3:7.2f} ms  t17={t9*1e3:7.2f} ms  -> "
          f"{bw:6.1f} GB/s sustained read", flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]}", flush=True)
    for depth in (2, 4, 8):
        try:
            run(depth)
        except Exception as e:
            print(f"  depth={depth} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
