"""Measure cold/warm compile + step time of the layer-pair fused talker-step
kernel (ops/talker_step_loop.py) at the serving geometry on real hardware.

Round-2 finding (NOTES.md): the fully-unrolled 28-layer kernel cold-compiles
for tens of minutes under Mosaic. The loop kernel cuts the IR ~14x; this
script quantifies the compile-time win and the per-step cost so the serving
default can be chosen on evidence.

Usage:  python examples/bench_step_loop_compile.py [batch] [cache_len]
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

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cache_len = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print(f"device={jax.devices()[0]} batch={batch} cache_len={cache_len}",
          flush=True)

    t0 = time.time()
    fps, ms = bench.bench_talker(batch=batch, cache_len=cache_len, steps=64,
                                 quantize=True, packed=True, step_kernel=True)
    t1 = time.time()
    print(f"compile+warmup+measure: {t1 - t0:.1f}s  "
          f"step={ms * 1e3:.3f} ms  frames/s={fps:.1f}", flush=True)


if __name__ == "__main__":
    main()
