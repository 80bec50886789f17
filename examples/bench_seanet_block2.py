"""Per-block A/B of the fused SEANet kernel vs the XLA unit chain at each
DecoderBlock's real geometry (300-frame serving chunk, batch configurable).

Block geometries (CodecDecoderConfig defaults, 300 frames in):
  block1: T= 9600  C=768     block2: T= 48000 C=384
  block3: T=192000 C=192     block4: T=576000 C=96

DCE-proof timing: iters chained with a strided-sum accumulator inside one
jit program (NOTES r4 finding #1 + the r5 DCE lesson).

Usage: python examples/bench_seanet_block2.py [batch=8] [iters=4]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(_ROOT, ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3_tts_tpu.models.codec_decoder import residual_unit
from qwen3_tts_tpu.ops.seanet_block import fused_block_units

BLOCKS = [(9600, 768), (48000, 384), (192000, 192), (576000, 96)]


def _unit_params(key, c):
    ks = jax.random.split(key, 4)
    mk = lambda shape, s: (jax.random.normal(ks[0], shape) * s).astype(jnp.bfloat16)
    return {
        "conv1_w": mk((7, c, c), 0.03), "conv1_b": mk((c,), 0.03),
        "conv2_w": mk((1, c, c), 0.03), "conv2_b": mk((c,), 0.03),
        "act1_alpha": mk((c,), 0.1), "act1_beta": mk((c,), 0.1),
        "act2_alpha": mk((c,), 0.1), "act2_beta": mk((c,), 0.1),
    }


def main(batch=8, iters=4):
    print(f"device={jax.devices()[0]} batch={batch} iters={iters}",
          file=sys.stderr, flush=True)
    for t, c in BLOCKS:
        units = tuple(_unit_params(jax.random.PRNGKey(c + i), c)
                      for i in range(3))
        x = (jax.random.normal(jax.random.PRNGKey(0), (batch, t, c)) * 0.3
             ).astype(jnp.bfloat16)

        def make(fused):
            @jax.jit
            def run(u, xx):
                acc = jnp.float32(0)
                h = xx
                for i in range(iters):
                    if fused:
                        h = fused_block_units(h, u)
                    else:
                        for up, d in zip(u, (1, 3, 9)):
                            h = residual_unit(h, up, d)
                    acc = acc + jnp.sum(h[:, ::499, 0].astype(jnp.float32))
                return acc
            return run

        row = [f"T={t:6d} C={c:3d}"]
        for fused in (False, True):
            fn = make(fused)
            t0 = time.time()
            float(fn(units, x))
            compile_s = time.time() - t0
            dts = []
            for s in (1, 2, 3):
                t0 = time.perf_counter()
                _ = float(fn(units, x + jnp.bfloat16(s * 1e-3)))
                dts.append(time.perf_counter() - t0)
            per = min(dts) / iters
            row.append(f"{'fused' if fused else 'xla':5s} {per * 1e3:8.2f} ms"
                       f" (compile {compile_s:.0f}s)")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
