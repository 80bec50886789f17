"""Headline benchmark: 1.7B-class talker decode + 12Hz vocoder throughput on
one TPU chip.

Prints ONE JSON line:
  {"metric": "audio_s_per_s_per_chip_1p7b", "value": <combined audio-seconds
   synthesized per wall-second per chip>, "unit": "audio_s/s",
   "vs_baseline": value / 10.0}

vs_baseline is the ratio against the >10x-realtime north-star target
(BASELINE.md: RTF > 10x => >125 frames/s/chip at 12.5 fps); the reference
publishes no throughput numbers (BASELINE.json.published == {}).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip XLA compilation
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3_tts_tpu.config import CodecDecoderConfig
from qwen3_tts_tpu.models.codec_decoder import codec_decode, init_codec_decoder_params
from qwen3_tts_tpu.models.presets import talker_1p7b
from qwen3_tts_tpu.models.talker import (TalkerState, talker_decode_step, talker_spec)
from qwen3_tts_tpu.nn.cache import KVCache
from qwen3_tts_tpu.nn.sampling import SamplingConfig, make_suppress_mask

FRAME_RATE = 12.5  # codec frames per second (1920 samples @ 24 kHz)


def _params_like(init_fn, *args, dtype):
    shapes = jax.eval_shape(lambda: init_fn(jax.random.PRNGKey(0), *args, dtype))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def bench_talker(batch: int = 1, cache_len: int = 512, steps: int = 64,
                 quantize: bool = False, packed: bool = False):
    cfg = talker_1p7b()
    spec = talker_spec(cfg)
    dtype = jnp.bfloat16
    from qwen3_tts_tpu.models.talker import (fuse_talker_params, init_talker_params,
                                             pack_talker_params,
                                             quantize_talker_params)

    params = _params_like(init_talker_params, cfg, dtype=dtype)
    params = jax.jit(fuse_talker_params)(params)
    if quantize:
        params = jax.jit(quantize_talker_params)(params)
    if packed:  # fused Pallas sub-talker micro-step kernel (int8 only)
        params = pack_talker_params(params)
    cache = KVCache.create(spec.num_layers, batch, cache_len, spec.num_kv_heads,
                           spec.head_dim, dtype=dtype)
    cache = cache._replace(index=jnp.asarray(64, jnp.int32))
    state = TalkerState(
        cache=cache,
        token0=jnp.zeros((batch,), jnp.int32),
        past_hidden=jnp.zeros((batch, cfg.hidden_size), dtype),
        seen=jnp.zeros((batch, cfg.vocab_size), bool),
        done=jnp.zeros((batch,), bool),
        key=jax.random.PRNGKey(0),
        step=jnp.zeros((batch,), jnp.int32),
        num_pads=jnp.zeros((batch,), jnp.int32),
    )
    trailing = jnp.zeros((batch, 32, cfg.hidden_size), dtype)
    pad_embed = jnp.zeros((1, cfg.hidden_size), dtype)
    pad_mask = jnp.ones((batch, cache_len), jnp.int32)
    suppress = make_suppress_mask(cfg.vocab_size, 1024, (cfg.codec_eos_token_id,))
    sampling = SamplingConfig()

    @jax.jit
    def run(params, state):
        def body(_, s):
            s, _, _ = talker_decode_step(params, cfg, s, trailing, pad_embed,
                                         pad_mask, sampling, sampling, suppress)
            return s
        return jax.lax.fori_loop(0, steps, body, state)

    # NOTE: timing on this runtime requires fetching a result to host —
    # block_until_ready alone does not synchronize, and identical-argument
    # calls can be served from a result cache, so the timed call uses a
    # different PRNG key and ends with a scalar fetch.
    int(run(params, state).step[0])  # compile + warmup
    dt = min(_timed_run(run, params, state, seed) for seed in (11, 22, 33))
    frames_per_s = steps * batch / dt
    return frames_per_s, dt / steps


def _timed_run(run, params, state, seed):
    st = state._replace(key=jax.random.PRNGKey(seed))
    t0 = time.perf_counter()
    out = run(params, st)
    _ = int(out.step[0]) + int(out.token0[0])
    return time.perf_counter() - t0


def bench_vocoder(frames: int = 300, batch: int = 1):
    cfg = CodecDecoderConfig()
    params = _params_like(init_codec_decoder_params, cfg, dtype=jnp.bfloat16)
    codes = jnp.zeros((batch, cfg.num_quantizers, frames), jnp.int32)
    codes2 = jnp.ones((batch, cfg.num_quantizers, frames), jnp.int32)
    fn = jax.jit(lambda p, c: codec_decode(p, cfg, c))
    float(fn(params, codes)[0, 0])  # compile + warmup

    def once(c):
        t0 = time.perf_counter()
        _ = float(fn(params, c)[0, 0])
        return time.perf_counter() - t0

    dt = min(once(codes2 + i) for i in range(3))
    audio_s = frames * batch / FRAME_RATE
    return audio_s / dt


def bench_first_packet(fp_frames: int = 4, prompt_len: int = 32, reps: int = 5):
    """p50 first-packet latency: prefill + fp_frames decode steps + vocode."""
    from qwen3_tts_tpu.models.talker import init_talker_params, talker_prefill

    cfg = talker_1p7b()
    spec = talker_spec(cfg)
    dtype = jnp.bfloat16
    params = _params_like(init_talker_params, cfg, dtype=dtype)
    dcfg = CodecDecoderConfig()
    dparams = _params_like(init_codec_decoder_params, dcfg, dtype=dtype)

    b = 1
    cache_len = prompt_len + 64
    suppress = make_suppress_mask(cfg.vocab_size, 1024, (cfg.codec_eos_token_id,))
    samp = SamplingConfig()
    embeds = jnp.zeros((b, prompt_len, cfg.hidden_size), dtype)
    mask = jnp.ones((b, prompt_len), jnp.int32)
    trailing = jnp.zeros((b, 16, cfg.hidden_size), dtype)
    pad_embed = jnp.zeros((1, cfg.hidden_size), dtype)
    pad_full = jnp.ones((b, cache_len), jnp.int32)

    # one fused program: prefill + fp_frames decode steps + vocode the packet
    # (mirrors the streaming session's fused first burst — one dispatch)
    @jax.jit
    def first_packet(p, dp, e, m, c, k):
        st = talker_prefill(p, cfg, e, m, c, k, samp, suppress)

        def body(carry, _):
            s2, _, _ = talker_decode_step(p, cfg, carry, trailing, pad_embed,
                                          pad_full, samp, samp, suppress)
            return s2, s2.token0

        st, toks = jax.lax.scan(body, st, None, length=fp_frames)
        codes = jnp.zeros((1, dcfg.num_quantizers, fp_frames), jnp.int32)
        codes = codes.at[:, 0, :].set(jnp.transpose(toks)[:1] % 2048)
        return codec_decode(dp, dcfg, codes)

    def once(seed):
        cache = KVCache.create(spec.num_layers, b, cache_len, spec.num_kv_heads,
                               spec.head_dim, dtype=dtype)
        t0 = time.perf_counter()
        _ = float(first_packet(params, dparams, embeds, mask, cache,
                               jax.random.PRNGKey(seed))[0, 0])
        return time.perf_counter() - t0

    once(0)
    times = sorted(once(s + 1) for s in range(reps))
    return times[reps // 2]


def main():
    # batch 32 keeps per-stream decode at ~24 ms/frame (3.3x realtime margin)
    serve_batch = int(os.environ.get("BENCH_BATCH", "32"))
    lm1_fps, lm1_ms = bench_talker(batch=1)
    lmN_fps, lmN_ms = bench_talker(batch=serve_batch)
    lmQ_fps, lmQ_ms = bench_talker(batch=serve_batch, quantize=True)
    try:
        lmK_fps, lmK_ms = bench_talker(batch=serve_batch, quantize=True, packed=True)
    except Exception as e:  # kernel variant must never take down the bench
        print(f"subtalker-kernel variant failed: {e!r}", file=sys.stderr)
        lmK_fps, lmK_ms = 1e-9, float("inf")
    voc_audio_1 = bench_vocoder(batch=1)
    voc_audio_n = bench_vocoder(batch=serve_batch)
    fp_p50 = bench_first_packet()
    single = 1.0 / (FRAME_RATE / lm1_fps + 1.0 / voc_audio_1)
    combined = 1.0 / (FRAME_RATE / lmN_fps + 1.0 / voc_audio_n)
    combined_int8 = 1.0 / (FRAME_RATE / lmQ_fps + 1.0 / voc_audio_n)
    combined_kern = 1.0 / (FRAME_RATE / lmK_fps + 1.0 / voc_audio_n)
    configs = {"bf16": combined, "int8": combined_int8,
               "int8+subtalker-kernel": combined_kern}
    serving_config = max(configs, key=configs.get)
    best = configs[serving_config]
    result = {
        "metric": "audio_s_per_s_per_chip_1p7b",
        "value": round(best, 3),
        "unit": "audio_s/s",
        "vs_baseline": round(best / 10.0, 3),
        "detail": {
            "serving_config": serving_config,
            "bf16_audio_s_per_s": round(combined, 3),
            "serve_batch": serve_batch,
            "talker_step_ms_b1": round(lm1_ms * 1e3, 3),
            "talker_step_ms_bN": round(lmN_ms * 1e3, 3),
            "talker_frames_per_s_bN": round(lmN_fps, 2),
            "single_stream_audio_s_per_s": round(single, 3),
            "vocoder_audio_s_per_s_b1": round(voc_audio_1, 3),
            "vocoder_audio_s_per_s_bN": round(voc_audio_n, 3),
            "first_packet_p50_ms": round(fp_p50 * 1e3, 1),
            "talker_step_ms_bN_int8": round(lmQ_ms * 1e3, 3),
            "int8_audio_s_per_s": round(combined_int8, 3),
            "talker_step_ms_bN_int8_kernel": round(lmK_ms * 1e3, 3),
            "int8_kernel_audio_s_per_s": round(combined_kern, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
