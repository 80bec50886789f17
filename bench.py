"""Headline benchmark: 1.7B-class talker decode + 12Hz vocoder throughput on
one TPU chip.

Prints ONE JSON line:
  {"metric": "audio_s_per_s_per_chip_1p7b", "value": <combined audio-seconds
   synthesized per wall-second per chip>, "unit": "audio_s/s",
   "vs_baseline": value / 10.0}

vs_baseline is the ratio against the >10x-realtime north-star target
(BASELINE.md: RTF > 10x => >125 frames/s/chip at 12.5 fps); the reference
publishes no throughput numbers (BASELINE.json.published == {}).

Budget discipline (round-1 lesson: the driver run timed out, rc=124; the
RPC-tunneled TPU link intermittently drops to ~1 MB/s, making large
executables take minutes to ship):
  - measurements run in value order — the serving talker config (int8 +
    Pallas sub-talker kernel, small cached programs) first with a
    documented conservative vocoder floor, then measured vocoder rates
    (cheap 75-frame program, then the full 300-frame serving chunk);
    latency detail (b=1, first packet) follows;
  - a watchdog thread emits the best-so-far JSON line and exits 0 at
    BENCH_BUDGET_S (default 420 s) so a stalled compile can never produce
    an empty result again;
  - the XLA persistent compile cache (.jax_cache/, committed to the repo)
    makes repeat runs skip compilation entirely;
  - the full variant matrix (bf16 / plain-int8 serving configs, vocoder b=1)
    only runs with BENCH_FULL=1.
"""

import functools
import json
import os
import sys
import threading
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

# ---------------------------------------------------------------------------
# result state shared with the watchdog
# ---------------------------------------------------------------------------

_lock = threading.Lock()
_printed = False
_detail: dict = {"phase": "init"}
_t0 = time.time()


def _emit_and_exit(code: int = 0):
    """Print the single JSON result line exactly once."""
    global _printed
    with _lock:
        if _printed:
            return
        _printed = True
        best = _detail.get("_best_audio_s", 0.0)
        result = {
            "metric": "audio_s_per_s_per_chip_1p7b",
            "value": round(best, 3),
            "unit": "audio_s/s",
            "vs_baseline": round(best / 10.0, 3),
            "detail": {k: v for k, v in _detail.items() if not k.startswith("_")},
        }
        result["detail"]["elapsed_s"] = round(time.time() - _t0, 1)
        print(json.dumps(result), flush=True)
    if code is not None:
        os._exit(code)


def _watchdog(budget_s: float):
    time.sleep(budget_s)
    _detail.setdefault("watchdog_fired_after_phase", _detail.get("phase"))
    _emit_and_exit(0)


def _note(phase: str):
    _detail["phase"] = phase
    print(f"[bench {time.time() - _t0:7.1f}s] {phase}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# param synthesis: cheap on-device pseudo-random fill (NOT zeros — zero params
# collapse int8 scales to 1e-8 and make sampling near-uniform; round-1 review)
# ---------------------------------------------------------------------------


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
            v = (jnp.sin(x * 0.9898 + 0.37 * i) * 0.02).astype(s.dtype)
            out.append(v.reshape(s.shape))
        return out

    return jax.tree.unflatten(treedef, build())


def bench_talker(batch: int = 1, cache_len: int = 512, steps: int = 64,
                 quantize=False, packed: bool = False,
                 step_kernel: bool = True, kv_quant: bool = False,
                 cfg=None):
    """quantize: False (bf16) | True/'int8' | 'int4' (group-wise, r4).
    cfg: talker geometry (default 1.7B; the 0.6B phase passes talker_0p6b)."""
    cfg = cfg or talker_1p7b()
    spec = talker_spec(cfg)
    dtype = jnp.bfloat16
    from qwen3_tts_tpu.models.talker import (fuse_talker_params, init_talker_params,
                                             pack_talker_params,
                                             quantize_talker_params,
                                             quantize_talker_params_int4)

    params = _params_like(init_talker_params, cfg, dtype=dtype)
    params = jax.jit(fuse_talker_params, donate_argnums=0)(params)
    if quantize == "int4":
        params = jax.jit(quantize_talker_params_int4, donate_argnums=0)(params)
    elif quantize:
        params = jax.jit(quantize_talker_params, donate_argnums=0)(params)
    if packed:  # fused Pallas sub-talker kernels (int8 / int4+int8-cp)
        params = pack_talker_params(params)
        if not step_kernel:
            # sub-talker kernels only (frame megakernel / micro-step), XLA
            # talker stack: the r1-proven serving config with a much
            # cheaper Mosaic compile than the 28-layer fused step kernel
            params.pop("talker_kernel", None)
            params.pop("talker_kernel_q4", None)
    cache = KVCache.create(spec.num_layers, batch, cache_len, spec.num_kv_heads,
                           spec.head_dim,
                           dtype=jnp.int8 if kv_quant else dtype)
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

    # state is DONATED: the KV cache must alias input->output or the run
    # carries two full cache buffers (b=128 at the serving shape OOMs) and
    # copies one per call (r3 profiling finding)
    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, state):
        def body(_, s):
            s, _, _ = talker_decode_step(params, cfg, s, trailing, pad_embed,
                                         pad_mask, sampling, sampling, suppress)
            return s
        return jax.lax.fori_loop(0, steps, body, state)

    # NOTE: timing on this runtime requires fetching a result to host —
    # block_until_ready alone does not synchronize, and identical-argument
    # calls can be served from a result cache, so the timed call uses a
    # different PRNG key and ends with a scalar fetch. The donated state is
    # threaded through the calls (each consumes the previous result).
    state = run(params, state)  # compile + warmup
    int(state.step[0])
    dts = []
    for seed in (11, 22, 33):
        state = state._replace(key=jax.random.PRNGKey(seed))
        t0 = time.perf_counter()
        state = run(params, state)
        _ = int(state.step[0]) + int(state.token0[0])
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    frames_per_s = steps * batch / dt
    return frames_per_s, dt / steps


_VOC_PARAMS = None


def bench_vocoder(frames: int = 300, batch: int = 1, fused: bool = False):
    """fused: route the narrow SEANet blocks through the per-block Pallas
    kernel (r5; codec_decode gates it at C <= 256)."""
    global _VOC_PARAMS
    cfg = CodecDecoderConfig()
    if _VOC_PARAMS is None:
        _VOC_PARAMS = _params_like(init_codec_decoder_params, cfg,
                                   dtype=jnp.bfloat16)
    params = _VOC_PARAMS
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (batch, cfg.num_quantizers, frames), 0, 2048)
    fn = jax.jit(lambda p, c: codec_decode(p, cfg, c, fused_seanet=fused))
    float(fn(params, codes)[0, 0])  # compile + warmup

    def once(c):
        t0 = time.perf_counter()
        _ = float(fn(params, c)[0, 0])
        return time.perf_counter() - t0

    dt = min(once((codes + i) % 2048) for i in (1, 2, 3))
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
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    threading.Thread(target=_watchdog, args=(budget,), daemon=True).start()

    # serve batch 80: r3 sweeps measured the full decode step at
    # 9.2/13.9/22.5/47.4 ms for b=32/64/96/128 bf16-KV (cache 512) and,
    # with the int8 KV cache, 11.3/13.5/18.9 ms at b=64/80/96 — b=80 is
    # the frames/s optimum (5909 f/s). The vocoder runs in sub-batches of
    # 32: its near-output convs materialize ~6.6 GB intermediates per 32
    # rows at the 300-frame chunk (larger vocode batches OOM), and 32
    # already saturates its throughput (~646 audio_s/s).
    serve_batch = int(os.environ.get("BENCH_BATCH", "80"))
    # vocoder sub-batch 16 (r5): throughput saturates by b=8-16 (r5 A/B:
    # 787/1169 audio-s/s at b=8), the serving scheduler vocodes in 16-row
    # buckets, and the b=32 f300 XLA graph with the polynomial sine
    # rematerializes past the 15.75 GB HBM (r4 fit at 32 with builtin sin)
    voc_batch = min(serve_batch, 16)
    full = os.environ.get("BENCH_FULL", "") == "1"
    _detail["serve_batch"] = serve_batch
    _detail["vocoder_batch"] = voc_batch
    _detail["device"] = str(jax.devices()[0])

    # Phase order is tunnel-robustness order (the RPC-tunneled TPU link
    # intermittently drops to ~1 MB/s, and the vocoder program is the
    # largest executable to ship): secure the talker headline first with a
    # conservative assumed vocoder rate, then replace the assumption with a
    # cheap measured vocoder, then refine at the full serving shape.

    # --- 1a. serving talker, plain int8 (pure-XLA program: the CHEAPEST
    # cold compile of any serving variant, ~2 min worst case) — lands a
    # guaranteed nonzero headline before any Pallas compile is attempted.
    # Round-2 lesson: the fused-kernel program cold-compiles in tens of
    # minutes under Mosaic; on a cache miss the old phase order burned the
    # whole budget inside that compile and the watchdog emitted 0.0.
    _note("talker_bN_int8_xla")
    serving_config = "int8"
    lmN_fps, lmN_ms = bench_talker(batch=serve_batch, quantize=True)
    # conservative assumed vocoder floor until measured (HW-measured 640+
    # audio-s/s at b=32 in r1/r2; 400 is a documented under-estimate), so a
    # watchdog fire after this phase still emits a meaningful headline
    voc_audio_n = 400.0
    _detail["vocoder_state"] = "assumed_floor_400"

    def _update_headline():
        combined = 1.0 / (FRAME_RATE / lmN_fps + 1.0 / voc_audio_n)
        _detail.update({
            "_best_audio_s": combined,
            "serving_config": serving_config,
            "talker_step_ms_bN": round(lmN_ms * 1e3, 3),
            "talker_frames_per_s_bN": round(lmN_fps, 2),
        })

    _update_headline()

    # --- 2. serving vocoder: cheap shape first, then the full 300-frame
    # serving chunk (each updates the headline with measured numbers) ---
    for frames, tag in ((75, "measured_f75"), (300, "measured_f300")):
        _note(f"vocoder_bN_{tag}")
        voc_audio_n = bench_vocoder(frames=frames, batch=voc_batch)
        _detail["vocoder_audio_s_per_s_bN"] = round(voc_audio_n, 3)
        _detail["vocoder_state"] = tag
        combined = 1.0 / (FRAME_RATE / lmN_fps + 1.0 / voc_audio_n)
        _detail["_best_audio_s"] = combined

    # --- 2a. fused-SEANet vocoder variant (r5): fast_sin + the per-block
    # Pallas kernel on the two narrow blocks. The block-kernel Mosaic
    # compiles measured 4-15 s each (far cheaper than the step kernels), so
    # this phase runs unconditionally; a failure cannot cost the headline.
    _note("vocoder_bN_fused")
    try:
        vocF = bench_vocoder(frames=300, batch=voc_batch, fused=True)
        _detail["vocoder_audio_s_per_s_bN_fused"] = round(vocF, 3)
        if vocF > voc_audio_n:
            voc_audio_n = vocF
            _detail["vocoder_audio_s_per_s_bN"] = round(vocF, 3)
            _detail["vocoder_state"] = "measured_f300_fused"
            _detail["_best_audio_s"] = 1.0 / (FRAME_RATE / lmN_fps
                                              + 1.0 / voc_audio_n)
    except Exception as e:
        print(f"fused vocoder variant failed: {e!r}", file=sys.stderr,
              flush=True)

    # --- 2b. int8 KV cache serving variant: halves the dominant HBM term
    # (KV read) of the decode step; scales fold into the attention dots so
    # nothing dequantized materializes (nn/cache.py). Kept as a measured
    # variant — the headline switches to it only if faster.
    _note("talker_bN_int8kv")
    try:
        kvN_fps, kvN_ms = bench_talker(batch=serve_batch, quantize=True,
                                       kv_quant=True)
        _detail["talker_step_ms_bN_int8kv"] = round(kvN_ms * 1e3, 3)
        if kvN_fps > lmN_fps:
            lmN_fps, lmN_ms = kvN_fps, kvN_ms
            serving_config = "int8+int8kv"
            _update_headline()
    except Exception as e:
        print(f"int8-kv variant failed: {e!r}", file=sys.stderr, flush=True)

    # --- 3. single-stream latency, plain int8 (cheap compile; the fused
    # kernels are attempted at the end as pure improvements) ---
    _note("talker_b1")
    lm1_fps, lm1_ms = bench_talker(batch=1, quantize=True)
    _detail["talker_b1_config"] = "int8"
    _detail["talker_step_ms_b1"] = round(lm1_ms * 1e3, 3)

    # --- 4. first packet (fused prefill + burst + vocode, bf16) ---
    _note("first_packet")
    try:
        fp_p50 = bench_first_packet()
        _detail["first_packet_p50_ms"] = round(fp_p50 * 1e3, 1)
    except Exception as e:
        print(f"first-packet bench failed: {e!r}", file=sys.stderr, flush=True)

    # --- 5. single-stream combined ---
    _note("vocoder_b1")
    voc_audio_1 = bench_vocoder(batch=1)
    single = 1.0 / (FRAME_RATE / lm1_fps + 1.0 / voc_audio_1)
    _detail["vocoder_audio_s_per_s_b1"] = round(voc_audio_1, 3)
    _detail["single_stream_audio_s_per_s"] = round(single, 3)

    if full:  # full variant matrix (not needed for the headline)
        _note("full_matrix_bf16")
        lmF_fps, lmF_ms = bench_talker(batch=serve_batch)
        _detail["talker_step_ms_bN_bf16"] = round(lmF_ms * 1e3, 3)
        _detail["bf16_audio_s_per_s"] = round(
            1.0 / (FRAME_RATE / lmF_fps + 1.0 / voc_audio_n), 3)
        _note("full_matrix_int8")
        lmQ_fps, lmQ_ms = bench_talker(batch=serve_batch, quantize=True)
        _detail["talker_step_ms_bN_int8"] = round(lmQ_ms * 1e3, 3)
        _detail["int8_audio_s_per_s"] = round(
            1.0 / (FRAME_RATE / lmQ_fps + 1.0 / voc_audio_n), 3)

    # --- 6. Pallas fused talker-step kernel, LAST: a pure improvement over
    # the already-measured XLA headline (a compile stall can only cost the
    # improvement, never the result; cache-warm runs enter in seconds).
    # The sub-talker kernels (micro-step + frame megakernel) are RETIRED
    # from the bench on r3 evidence: inside the one-program decode step the
    # whole 15-micro-step cp loop costs 0.48 ms at b=64 (the r2 "5 ms" was
    # per-dispatch measurement overhead), so their ceiling is <0.5 ms
    # against a tens-of-minutes Mosaic cold compile (NOTES.md). They remain
    # parity-tested opt-ins via quantization="int8-kernel".
    # Attempt a batch's kernel phase only when BENCH_TRY_STEP_KERNEL=1 or
    # that batch's warm-cache marker exists (STEP_KERNEL_WARM_B{batch}).
    # The marker is written by THIS script after a successful in-bench
    # kernel run — never by side scripts: Pallas cache keys are trace-order
    # dependent (NOTES.md), so only an entry warmed inside bench.py's own
    # trace order is guaranteed to hit, and a side-script marker could make
    # a driver run eat a ~17-40 min cold Mosaic compile (r3 advisor).
    # First-time warm-up: BENCH_TRY_STEP_KERNEL=1 BENCH_BUDGET_S=3600.
    # r3 hardware measurements: b=64 kernel 16.10 ms vs 12.95 XLA (retired
    # from serving); b=1 kernel 5.109 ms vs 5.55 XLA (kept for the
    # single-stream latency config).
    def _kernel_warm(batch: int) -> bool:
        return (os.environ.get("BENCH_TRY_STEP_KERNEL", "") == "1"
                or os.path.exists(os.path.join(
                    _CACHE_DIR, f"STEP_KERNEL_WARM_B{batch}")))

    def _write_kernel_marker(batch: int, ms: float):
        with open(os.path.join(_CACHE_DIR, f"STEP_KERNEL_WARM_B{batch}"),
                  "w") as f:
            f.write(f"warmed in-bench: batch={batch} step_ms={ms * 1e3:.3f}\n")

    # --- 6a. sub-talker frame kernel at the serving batch (r4): phase-B80
    # profiling pinned ~4.0 ms of the 13.6 ms b=80 step on the XLA cp loop
    # INSIDE the serving program (weights re-read every micro-step when
    # interleaved with the talker stack; ~0.5 ms isolated). The frame
    # megakernel streams cp weights once per 40-row chunk (2 chunks at
    # b=80), reclaiming most of it. Own marker: its Mosaic compile is the
    # 40-row frame kernel, much cheaper than the 28-layer step kernel.
    def _cp_kernel_warm(batch: int) -> bool:
        return (os.environ.get("BENCH_TRY_CP_KERNEL", "") == "1"
                or os.environ.get("BENCH_TRY_STEP_KERNEL", "") == "1"
                or os.path.exists(os.path.join(
                    _CACHE_DIR, f"CP_KERNEL_WARM_B{batch}")))

    if _cp_kernel_warm(serve_batch):
        _note("talker_bN_int8kv_cpkernel")
        try:
            cN_fps, cN_ms = bench_talker(batch=serve_batch, quantize=True,
                                         kv_quant=True, packed=True,
                                         step_kernel=False)
            _detail["talker_step_ms_bN_cpkernel"] = round(cN_ms * 1e3, 3)
            with open(os.path.join(_CACHE_DIR,
                                   f"CP_KERNEL_WARM_B{serve_batch}"), "w") as f:
                f.write(f"warmed in-bench: batch={serve_batch} "
                        f"step_ms={cN_ms * 1e3:.3f}\n")
            if cN_fps > lmN_fps:
                lmN_fps, lmN_ms = cN_fps, cN_ms
                serving_config = "int8+int8kv+cp-kernel"
                _update_headline()
        except Exception as e:
            print(f"cp-kernel serving variant failed: {e!r}", file=sys.stderr,
                  flush=True)

    # --- 6b. int4-weight fused step kernel at b=1 (r4 verdict #3/#6): the
    # b=1 step is weight-read bound; int4 halves the stream (~2.4 ms floor
    # at the measured ~350 GB/s achievable HBM bandwidth) and the kernel
    # accepts the int8 KV cache directly. XLA cannot exploit int4 (the
    # dequant chain dominates: 30.9 ms/step measured) — kernel-only config.
    def _q4_kernel_warm() -> bool:
        return (os.environ.get("BENCH_TRY_STEP_KERNEL", "") == "1"
                or os.path.exists(os.path.join(_CACHE_DIR,
                                               "STEP_Q4_WARM_B1")))

    if _q4_kernel_warm():
        _note("talker_b1_int4_kernel")
        try:
            q1_fps, q1_ms = bench_talker(batch=1, quantize="int4",
                                         packed=True, kv_quant=True)
            _detail["talker_step_ms_b1_int4_kernel"] = round(q1_ms * 1e3, 3)
            with open(os.path.join(_CACHE_DIR, "STEP_Q4_WARM_B1"), "w") as f:
                f.write(f"warmed in-bench: step_ms={q1_ms * 1e3:.3f}\n")
            if q1_fps > lm1_fps:
                lm1_fps, lm1_ms = q1_fps, q1_ms
                _detail["talker_b1_config"] = "int4+int8kv-kernel"
                _detail["talker_step_ms_b1"] = round(q1_ms * 1e3, 3)
                _detail["single_stream_audio_s_per_s"] = round(
                    1.0 / (FRAME_RATE / lm1_fps + 1.0 / voc_audio_1), 3)
        except Exception as e:
            print(f"b=1 int4 kernel variant failed: {e!r}", file=sys.stderr,
                  flush=True)

    if _kernel_warm(serve_batch):
        _note("talker_bN_int8_kernel_stepfused")
        try:
            kN_fps, kN_ms = bench_talker(batch=serve_batch, quantize=True,
                                         packed=True, step_kernel=True)
            _detail["talker_step_ms_bN_kernel_stepfused"] = round(kN_ms * 1e3, 3)
            _write_kernel_marker(serve_batch, kN_ms)
            if kN_fps > lmN_fps:
                lmN_fps, lmN_ms = kN_fps, kN_ms
                serving_config = "int8+kernel-stepfused"
                _update_headline()  # voc_audio_n holds measured_f300
        except Exception as e:  # kernels must never take down the bench
            print(f"step-kernel variant failed: {e!r}", file=sys.stderr,
                  flush=True)
    if _kernel_warm(1):
        _note("talker_b1_int8_kernel_stepfused")
        try:
            k1_fps, k1_ms = bench_talker(batch=1, quantize=True,
                                         packed=True, step_kernel=True)
            _detail["talker_step_ms_b1_kernel_stepfused"] = round(k1_ms * 1e3, 3)
            _write_kernel_marker(1, k1_ms)
            if k1_fps > lm1_fps:
                lm1_fps, lm1_ms = k1_fps, k1_ms
                _detail["talker_b1_config"] = "int8+kernel-stepfused"
                _detail["talker_step_ms_b1"] = round(k1_ms * 1e3, 3)
                _detail["single_stream_audio_s_per_s"] = round(
                    1.0 / (FRAME_RATE / lm1_fps + 1.0 / voc_audio_1), 3)
        except Exception as e:
            print(f"b=1 step-kernel variant failed: {e!r}", file=sys.stderr,
                  flush=True)

    # --- 7. 0.6B geometry detail rows (r4 verdict next-round #7): the
    # released family ships 0.6B checkpoints too (README.md:68-79) — record
    # b=1 and serving-batch step times at talker_0p6b so weights-day covers
    # both sizes and the kernel gates see the second geometry. Pure-XLA int8
    # programs (cheap compiles); failures never cost the headline.
    _note("talker_0p6b")
    try:
        from qwen3_tts_tpu.models.presets import talker_0p6b

        s6_fps, s6_ms = bench_talker(batch=serve_batch, quantize=True,
                                     kv_quant=True, cfg=talker_0p6b())
        _detail["talker_0p6b_step_ms_bN"] = round(s6_ms * 1e3, 3)
        b6_fps, b6_ms = bench_talker(batch=1, quantize=True,
                                     cfg=talker_0p6b())
        _detail["talker_0p6b_step_ms_b1"] = round(b6_ms * 1e3, 3)
        _detail["talker_0p6b_audio_s_per_s"] = round(
            1.0 / (FRAME_RATE / s6_fps + 1.0 / voc_audio_n), 3)
    except Exception as e:
        print(f"0.6B phase failed: {e!r}", file=sys.stderr, flush=True)

    _note("done")
    _emit_and_exit(None)


if __name__ == "__main__":
    main()
