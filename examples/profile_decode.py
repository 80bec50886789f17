"""Decompose the serving decode step on real hardware (VERDICT r2 weak #2/#3).

Answers, with device measurements:
  1. where the b=32 19.6 ms step goes: talker stack vs sub-talker cp loop
     vs sampling/dispatch;
  2. how the full step scales with serve batch (32/64/128) — decode at 32
     rows under-fills both the MXU and HBM bandwidth;
  3. vocoder throughput at matching batches;
  4. cp-loop XLA vs frame-megakernel inside the *full* step shape (weak #3).

Usage:  python examples/profile_decode.py [phaseA|phaseB|phaseC|all] [cache_len]
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
from qwen3_tts_tpu.models import talker as talker_mod
from qwen3_tts_tpu.models.presets import talker_1p7b
from qwen3_tts_tpu.nn.sampling import SamplingConfig


def _cp_only(batch: int, packed: bool, steps: int = 64):
    """Time the sub-talker frame loop alone (15 sequential micro-steps)."""
    cfg = talker_1p7b()
    dtype = jnp.bfloat16
    params = bench._params_like(talker_mod.init_talker_params, cfg, dtype=dtype)
    params = jax.jit(talker_mod.fuse_talker_params, donate_argnums=0)(params)
    params = jax.jit(talker_mod.quantize_talker_params, donate_argnums=0)(params)
    if packed:
        params = talker_mod.pack_talker_params(params)
        params.pop("talker_kernel", None)
    sampling = SamplingConfig()
    past = jnp.zeros((batch, cfg.hidden_size), dtype)
    first = jnp.zeros((batch, cfg.hidden_size), dtype)

    @jax.jit
    def run(params, key):
        def body(_, carry):
            key, acc = carry
            key, sub = jax.random.split(key)
            codes, esum = talker_mod.code_predictor_generate(
                params, cfg, past, first, sub, sampling)
            # consume EVERY output: the first edition summed only
            # codes[0, 0], which let XLA dead-code-eliminate micro-steps
            # 2..15 and under-measured the loop ~8x (r4 finding #5 — the
            # r3 "cp = 0.48 ms" came from this)
            return key, acc + jnp.sum(codes) + jnp.sum(esum).astype(jnp.int32)
        _, acc = jax.lax.fori_loop(0, steps, body, (key, jnp.int32(0)))
        return acc

    int(run(params, jax.random.PRNGKey(0)))
    def once(seed):
        t0 = time.perf_counter()
        _ = int(run(params, jax.random.PRNGKey(seed)))
        return time.perf_counter() - t0
    dt = min(once(s) for s in (11, 22, 33))
    return dt / steps


def _stack_only(batch: int, cache_len: int, steps: int = 64,
                kv_quant: bool = False):
    """Full decode step with the sub-talker stubbed out: talker stack +
    codec-head + sampling + embedding assembly only."""
    orig = talker_mod.code_predictor_generate

    def stub(params, cfg, past_hidden, first_embed, key, sampling):
        b = past_hidden.shape[0]
        return (jnp.zeros((b, cfg.num_code_groups - 1), jnp.int32),
                jnp.zeros_like(past_hidden))

    talker_mod.code_predictor_generate = stub
    try:
        fps, ms = bench.bench_talker(batch=batch, cache_len=cache_len,
                                     quantize=True, kv_quant=kv_quant)
    finally:
        talker_mod.code_predictor_generate = orig
    return ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cache_len = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print(f"device={jax.devices()[0]} cache_len={cache_len}", flush=True)

    if which in ("phaseA", "all"):
        print("== phase A: full-step int8 XLA batch sweep ==", flush=True)
        for b in (32, 64, 96, 128):
            t0 = time.time()
            fps, ms = bench.bench_talker(batch=b, cache_len=cache_len,
                                         quantize=True)
            print(f"  b={b:4d}  step={ms*1e3:7.3f} ms  frames/s={fps:8.1f}  "
                  f"audio_s/s={fps/12.5:7.2f}  (wall {time.time()-t0:.0f}s)",
                  flush=True)

    if which in ("phaseB", "all"):
        for b in (32, 64):
            print(f"== phase B: decomposition at b={b} ==", flush=True)
            ms = _stack_only(b, cache_len)
            print(f"  talker-stack-only step: {ms*1e3:7.3f} ms", flush=True)
            for packed, tag in ((False, "xla"), (True, "megakernel")):
                try:
                    dt = _cp_only(b, packed)
                    print(f"  cp-loop-only ({tag}): {dt*1e3:7.3f} ms", flush=True)
                except Exception as e:
                    print(f"  cp-loop-only ({tag}) failed: {e!r}", flush=True)

    if which in ("phaseB80",):
        # r4: decomposition at the b=80 serving config (int8 + int8 KV) —
        # phase D showed sampling is only ~0.4 ms, so the remaining
        # (step - stack) must be the cp loop + embedding assembly
        b = 80
        print(f"== phase B80: decomposition at b={b} int8+int8kv ==", flush=True)
        ms = _stack_only(b, cache_len, kv_quant=True)
        print(f"  stack-only step (int8+int8kv): {ms*1e3:7.3f} ms", flush=True)
        for packed, tag in ((False, "xla"), (True, "megakernel")):
            try:
                dt = _cp_only(b, packed)
                print(f"  cp-loop-only ({tag}): {dt*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"  cp-loop-only ({tag}) failed: {e!r}", flush=True)

    if which in ("phaseC", "all"):
        print("== phase C: vocoder batch sweep (f=300) ==", flush=True)
        for b in (32, 64):
            t0 = time.time()
            rate = bench.bench_vocoder(frames=300, batch=b)
            print(f"  b={b:4d}  audio_s/s={rate:8.1f}  (wall {time.time()-t0:.0f}s)",
                  flush=True)

    if which in ("phaseE", "all"):
        # r3 verdict next-round #3: int4 weights at the latency shapes
        print("== phase E: int4 weight quantization ==", flush=True)
        for b in (1, 80):
            try:
                fps, ms = bench.bench_talker(batch=b, quantize="int4")
                print(f"  b={b:3d}  int4 step: {ms*1e3:7.3f} ms  "
                      f"frames/s={fps:8.1f}", flush=True)
            except Exception as e:
                print(f"  b={b}: int4 failed {e!r}", flush=True)

    if which in ("phaseD", "all"):
        # r3 verdict next-round #2: where do (step - stack - cp) ms go?
        # Ablate the sampling chain inside the serving config (int8+int8kv).
        import qwen3_tts_tpu.nn.sampling as sampling_mod
        print("== phase D: sampling-chain ablation at the serving config ==",
              flush=True)
        for b in (64, 80):
            fps, ms = bench.bench_talker(batch=b, quantize=True, kv_quant=True)
            print(f"  b={b}  full step            : {ms*1e3:7.3f} ms", flush=True)

            orig_proc = talker_mod.process_logits
            orig_sample = talker_mod.sample_token
            try:
                # no processor chain (rep-pen/suppress/temp/top-k/top-p);
                # still categorical-samples raw logits
                talker_mod.process_logits = (
                    lambda logits, *a, **k: logits.astype(jnp.float32))
                fps, ms = bench.bench_talker(batch=b, quantize=True,
                                             kv_quant=True)
                print(f"  b={b}  - processor chain    : {ms*1e3:7.3f} ms",
                      flush=True)
                # greedy argmax instead of gumbel categorical
                talker_mod.sample_token = (
                    lambda key, logits, do_sample: jnp.argmax(
                        logits, axis=-1).astype(jnp.int32))
                fps, ms = bench.bench_talker(batch=b, quantize=True,
                                             kv_quant=True)
                print(f"  b={b}  - chain - categorical: {ms*1e3:7.3f} ms",
                      flush=True)
            finally:
                talker_mod.process_logits = orig_proc
                talker_mod.sample_token = orig_sample


if __name__ == "__main__":
    main()
