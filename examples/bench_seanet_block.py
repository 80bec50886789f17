"""Hardware A/B: full vocoder with the per-DecoderBlock fused SEANet kernel
(ops/seanet_block.py) vs the XLA conv path (r4 verdict next-round #2).

Timing per NOTES r4 finding #1: ITERS chained applications inside one jit
program (the RPC dispatch floor is 25-100 ms), result fetched to host.

Usage: python examples/bench_seanet_block.py [batch=8] [frames=300] [iters=4]
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

from qwen3_tts_tpu.config import CodecDecoderConfig
from qwen3_tts_tpu.models.codec_decoder import (codec_decode,
                                                init_codec_decoder_params)

FRAME_RATE = 12.5


def _params_like(init_fn, *args, dtype):
    shapes = jax.eval_shape(lambda: init_fn(jax.random.PRNGKey(0), *args, dtype))
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def build():
        out = []
        for i, s in enumerate(leaves):
            n = 1
            for d in s.shape:
                n *= d
            x = jax.lax.iota(jnp.float32, max(n, 1)).reshape(s.shape or (1,))
            out.append((jnp.sin(x * 0.9898 + 0.37 * i) * 0.02).astype(s.dtype))
        return out

    return jax.tree.unflatten(treedef, build())


def main(batch=8, frames=300, iters=4):
    cfg = CodecDecoderConfig()
    params = _params_like(init_codec_decoder_params, cfg, dtype=jnp.bfloat16)
    codes = jax.random.randint(jax.random.PRNGKey(0),
                               (batch, cfg.num_quantizers, frames), 0, 2048)
    print(f"device={jax.devices()[0]} batch={batch} frames={frames} "
          f"iters={iters}", file=sys.stderr, flush=True)

    def make(fused):
        @jax.jit
        def run(p, c):
            # ACCUMULATE across iters — assigning only the last result lets
            # XLA dead-code-eliminate the previous iterations (NOTES r4
            # finding #5's profiler bug; this script's first version had it)
            acc = jnp.float32(0)
            for i in range(iters):
                w = codec_decode(p, cfg, (c + i) % 2048, fused_seanet=fused)
                # strided reduction over the whole wave: every iteration's
                # full output stays live
                acc = acc + jnp.sum(w[:, ::997].astype(jnp.float32))
            return acc
        return run

    results = {}
    for fused in (False, True):
        tag = "fused" if fused else "xla"
        fn = make(fused)
        t0 = time.time()
        float(fn(params, codes))  # compile + warm
        print(f"{tag}: compile+warm {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        dts = []
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            _ = float(fn(params, codes + s))
            dts.append(time.perf_counter() - t0)
        per = min(dts) / iters
        audio = frames * batch / FRAME_RATE
        results[tag] = (per, audio / per)
        print(f"{tag}: {per * 1e3:.2f} ms/decode -> "
              f"{audio / per:.1f} audio_s/s", flush=True)
    if all(k in results for k in ("xla", "fused")):
        print(f"speedup: {results['xla'][0] / results['fused'][0]:.3f}x",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
