"""Measure the DEPLOYED serving stack on hardware and reconcile it with the
component-derived bench headline (r4 verdict next-round #1).

The BENCH headline (audio-s/s/chip) is computed from two isolated device
loops (bare decode-step loop + bare vocoder call, bench.py); nothing had
ever measured the deployable path — ContinuousBatcher bursts + bucketed
join prefills + harvest syncs + batched vocoding — end to end. This script
builds the production-geometry model IN MEMORY (random weights, same
geometry source as bench.py: models/presets.py) and drives the real
batcher:

  phase A  offline throughput: N requests x F frames through a saturated
           capacity-B batch -> sustained audio-s/s, request p50/p95, and
           the worker-loop phase ledger (admit / dispatch / sync / harvest)
  phase B  join-to-first-audio under load: M streaming submits against the
           busy batch -> p50/p99 (r4 verdict weak #6)

Usage:
  python examples/serve_measure.py [--capacity 80] [--cache-len 1024]
      [--burst 8] [--requests 120] [--max-frames 256] [--streams 6]
      [--talker 1p7b] [--no-cp-kernel] [--warm-only]

Emits one JSON line per phase on stdout; human progress on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("SERVE_MEASURE_CPU"):  # CPU smoke mode (--talker tiny);
    jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS is pinned here

_CACHE_DIR = os.path.join(_ROOT, ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FRAME_RATE = 12.5


def log(msg: str):
    print(f"[serve_measure {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _params_like(init_fn, *args, dtype):
    """On-device pseudo-random params (same recipe as bench.py — zeros
    collapse int8 scales and make sampling near-uniform)."""
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


def build_model(talker: str = "1p7b", dtype=jnp.bfloat16,
                cp_kernel: bool = True):
    """Production-geometry Qwen3TTSModel assembled in memory at the BENCH
    serving config (int8 weights + packed cp kernels, XLA talker stack)."""
    from _checkpoint import StubProcessor

    from qwen3_tts_tpu.config import CodecConfig, CodecDecoderConfig, TTSConfig
    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel
    from qwen3_tts_tpu.inference.tts_tokenizer import Qwen3TTSTokenizer
    from qwen3_tts_tpu.models.codec_decoder import init_codec_decoder_params
    from qwen3_tts_tpu.models.presets import talker_0p6b, talker_1p7b
    from qwen3_tts_tpu.models.talker import (fuse_talker_params,
                                             init_talker_params,
                                             pack_talker_params,
                                             quantize_talker_params)

    if talker == "tiny":  # CPU smoke mode: harness-logic check only
        from qwen3_tts_tpu.models.presets import tiny_talker

        cfg_t = tiny_talker()
        dcfg = CodecDecoderConfig(
            codebook_size=32, hidden_size=32, latent_dim=16,
            num_attention_heads=4, num_key_value_heads=4, sliding_window=8,
            intermediate_size=64, num_hidden_layers=2, num_quantizers=4,
            upsample_rates=(2, 2), upsampling_ratios=(2,), decoder_dim=32,
            codebook_dim=16)
    else:
        cfg_t = {"1p7b": talker_1p7b, "0p6b": talker_0p6b}[talker]()
        dcfg = CodecDecoderConfig()
    log(f"building {talker} talker params (int8, cp_kernel={cp_kernel})")
    params = _params_like(init_talker_params, cfg_t, dtype=dtype)
    params = jax.jit(fuse_talker_params, donate_argnums=0)(params)
    params = jax.jit(quantize_talker_params, donate_argnums=0)(params)
    if cp_kernel:
        params = pack_talker_params(params)
        # serving config = XLA talker stack + Pallas cp kernels (the fused
        # step kernel lost at serve batches, r3; bench pops it the same way)
        params.pop("talker_kernel", None)
        params.pop("talker_kernel_q4", None)

    log("building 12Hz vocoder params")
    voc = _params_like(init_codec_decoder_params, dcfg, dtype=dtype)
    tok = Qwen3TTSTokenizer(CodecConfig(decoder=dcfg), None, voc, dtype)
    if talker != "tiny":
        # r5 HW A/B: fused narrow-block SEANet + fast_sin = 1.48x vocoder
        tok.fused_seanet = True

    tts_cfg = TTSConfig(talker=cfg_t, tts_model_type="custom_voice",
                        tts_model_size=talker.replace("p", "."),
                        tokenizer_type="v2_12hz")
    model = Qwen3TTSModel(tts_cfg, params, speech_tokenizer=tok,
                          processor=StubProcessor(), dtype=dtype)
    return model


def _percentile(sorted_vals, p):
    if not sorted_vals:
        return None
    return sorted_vals[min(int(p * (len(sorted_vals) - 1) + 0.5),
                           len(sorted_vals) - 1)]


def warm(batcher, model, max_frames: int, text: str):
    """Deterministic warmup of every program the measurement will hit:
    join bucket for the prompt width, the burst program, and the vocoder
    row buckets at the bucketed time shape.

    The vocoder bucket set is NARROWED to (1, 8, 32) for the measurement —
    each bucket is a multi-minute cold XLA compile of the full vocoder on
    this host; padding waste within a bucket costs far less than a mid-
    measurement compile."""
    batcher._ROW_BUCKETS = tuple(
        r for r in (1, 8, batcher.vocode_batch)
        if r <= max(batcher.capacity, 1)) or (1,)
    # join K-bucket warm BEFORE the worker starts: each (w, K) jit pays a
    # multi-second TRACE once per process even when the persistent compile
    # cache hits — untraced buckets stall the worker mid-measurement
    # (admit_s 14.3 s in the first grouped-joins run). Drive _admit
    # manually with K queued requests so each bucket traces+loads now.
    assert not batcher._thread.is_alive(), \
        "warm() expects the batcher built with _start_thread=False"
    for k in (8, 4, 2, 1):
        t0 = time.time()
        for i in range(k):
            batcher.submit(f"{text} warm {k}.{i}", speaker="vivian",
                           language="english", max_frames=4)
        batcher._admit()
        for slot in list(batcher._active):
            batcher._finish_request(slot)  # inline vocode (thread unstarted)
        log(f"warm join K={k}: {time.time() - t0:.1f}s")
    batcher._thread.start()
    batcher._vocoder_thread.start()
    t0 = time.time()
    log("warmup: 1 request through the batcher (join + burst + vocode)")
    fut = batcher.submit(text, speaker="vivian", language="english",
                         max_frames=min(max_frames, 2 * batcher.burst_frames))
    fut.result(timeout=3600)
    log(f"warmup request done in {time.time() - t0:.1f}s")
    # vocoder shape grid: EVERY (row bucket) x (75-frame time bucket up to
    # max_frames) the measurement can produce — EOS-shortened requests land
    # in the shorter time buckets, and an unwarmed shape is a multi-minute
    # cold compile inside the vocoder thread mid-measurement (r5 run 5:
    # 104 s of worker idle was exactly this). One-time: .jax_cache persists.
    t_max = -(-max_frames // 75) * 75
    k = model.config.talker.num_code_groups
    for rows in batcher._ROW_BUCKETS:
        for t_pad in range(75, t_max + 1, 75):
            t0 = time.time()
            codes = [np.ones((t_pad, k), np.int64) for _ in range(rows)]
            model.speech_tokenizer.decode([{"audio_codes": c} for c in codes])
            dt = time.time() - t0
            if dt > 2:
                log(f"warm vocoder rows={rows} t={t_pad}: {dt:.1f}s")
    # one unloaded stream: compiles the incremental chunk-vocode shapes
    # (ctx+4 ... ctx+29) phase B's first-packet numbers would otherwise eat
    t0 = time.time()
    for _ in batcher.submit_stream(text, speaker="vivian",
                                   language="english",
                                   max_frames=4 * batcher.burst_frames,
                                   emit_chunk_frames=4):
        pass
    log(f"warm stream done in {time.time() - t0:.1f}s")


def phase_a(batcher, n_requests: int, max_frames: int, text: str,
            mixed: bool = False):
    """Offline throughput through the saturated batch.

    Audio accounting: delivered FRAMES / 12.5 (via fut.request.frames), not
    trimmed wav lengths — the vocoder trims rows where codebook-0 == 0
    (reference semantics), which zeroes out random-weight runs while the
    device still did identical work."""
    lock = threading.Lock()
    done_t, latencies = [], []
    t0 = time.perf_counter()
    stats0 = dict(batcher.stats)

    def cb(fut, t_submit):
        fut.result()
        with lock:
            done_t.append(time.perf_counter())
            latencies.append(time.perf_counter() - t_submit)

    # submit from a CLIENT POOL: one submitter thread per ~8 requests (16
    # max). Serial submission bottlenecked the measurement — each submit
    # pays prompt assembly (device ops + one host fetch, ~0.5 s over the
    # RPC tunnel), so 120 serial submits trickled in slower than the batch
    # drained and occupancy never passed ~9/80 slots (r5 run 3).
    from concurrent.futures import ThreadPoolExecutor

    futs = [None] * n_requests

    def mf(i):
        if not mixed:
            return max_frames
        # deterministic spread over [0.6, 1.16]x max_frames: de-correlates
        # finishes (uniform lengths make adversarial waves: every slot
        # drains at once, then the batch refills from empty)
        return int(max_frames * 0.6) + (i * 61) % (max_frames // 2 + 1)

    def submit_one(i):
        t_submit = time.perf_counter()
        fut = batcher.submit(f"{text} variant {i}", speaker="vivian",
                             language="english", max_frames=mf(i))
        fut.add_done_callback(lambda f, ts=t_submit: cb(f, ts))
        futs[i] = fut

    with ThreadPoolExecutor(max_workers=min(16, max(n_requests // 8, 1))) \
            as pool:
        list(pool.map(submit_one, range(n_requests)))
    for f in futs:
        f.result(timeout=7200)
    wall = max(done_t) - t0
    delivered_frames = sum(
        min(sum(len(fr) for fr in f.request.frames), f.request.max_frames)
        for f in futs)
    total_audio = delivered_frames / 12.5
    lat = sorted(latencies)
    # steady-state window: drop the first 10% of completions (ramp while the
    # batch fills) and rate the rest against their own window
    k = max(1, len(done_t) // 10)
    ds = sorted(done_t)
    steady_wall = ds[-1] - ds[k - 1]
    steady_audio = total_audio * (len(ds) - k) / len(ds)
    stats = {k2: round(v - stats0.get(k2, 0), 3) if isinstance(v, float)
             else v - stats0.get(k2, 0)
             for k2, v in batcher.stats.items()}
    return {
        "requests": n_requests,
        "max_frames": max_frames,
        "wall_s": round(wall, 2),
        "delivered_frames": delivered_frames,
        "total_audio_s": round(total_audio, 2),
        "audio_s_per_s": round(total_audio / wall, 2),
        "audio_s_per_s_steady": round(steady_audio / steady_wall, 2)
        if steady_wall > 0 else None,
        "request_p50_s": round(_percentile(lat, 0.5), 2),
        "request_p95_s": round(_percentile(lat, 0.95), 2),
        "batcher_stats_delta": stats,
    }


def phase_b(batcher, n_streams: int, bg_requests: int, max_frames: int,
            text: str):
    """submit_stream join-to-first-audio under load (r4 verdict weak #6)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as pool:
        bg = list(pool.map(
            lambda i: batcher.submit(f"{text} background {i}",
                                     speaker="vivian", language="english",
                                     max_frames=max_frames),
            range(bg_requests)))
    time.sleep(1.0)  # let the batch saturate
    first_ms = []
    for i in range(n_streams):
        t0 = time.perf_counter()
        gen = batcher.submit_stream(f"{text} stream {i}", speaker="vivian",
                                    language="english",
                                    max_frames=4 * batcher.burst_frames,
                                    emit_chunk_frames=4)
        for _chunk in gen:
            first_ms.append((time.perf_counter() - t0) * 1e3)
            break
        for _chunk in gen:
            pass
    for f in bg:
        f.result(timeout=7200)
    fm = sorted(first_ms)
    return {
        "streams": n_streams,
        "bg_requests": bg_requests,
        "join_to_first_audio_p50_ms": round(_percentile(fm, 0.5), 1),
        "join_to_first_audio_p99_ms": round(_percentile(fm, 0.99), 1),
        "all_ms": [round(v, 1) for v in fm],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=80)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--requests", type=int, default=120)
    ap.add_argument("--max-frames", type=int, default=256)
    ap.add_argument("--streams", type=int, default=6)
    ap.add_argument("--talker", default="1p7b",
                    choices=("1p7b", "0p6b", "tiny"))
    ap.add_argument("--no-cp-kernel", action="store_true")
    ap.add_argument("--kv", default="int8", choices=("int8", "bf16"))
    ap.add_argument("--warm-only", action="store_true")
    ap.add_argument("--depth", type=int, default=1,
                    help="batcher pipeline depth (bursts kept in flight)")
    ap.add_argument("--mixed", action="store_true",
                    help="spread request lengths over [0.6, 1.16]x max-frames")
    ap.add_argument("--skip-streams", action="store_true")
    args = ap.parse_args()

    from qwen3_tts_tpu.serving.scheduler import ContinuousBatcher

    dev = str(jax.devices()[0])
    log(f"device: {dev}")
    model = build_model(args.talker, cp_kernel=not args.no_cp_kernel)
    batcher = ContinuousBatcher(
        model, capacity=args.capacity, cache_len=args.cache_len,
        burst_frames=args.burst,
        kv_cache_dtype=None if args.kv == "bf16" else "int8",
        max_queue=4 * args.capacity, pipeline_depth=args.depth,
        # 16-row vocode batches: the b>=8 vocoder is within ~7% of its
        # saturated rate while halving the ~6.6 GB 32-row intermediates —
        # the b=80 int8-KV cache (4.7 GB) + weights already hold ~7 GB
        vocode_batch=16,
        _start_thread=False)  # warm() traces the join K-buckets first
    text = ("The quick brown fox jumps over the lazy dog while the river "
            "keeps flowing north past the old stone bridge.")
    try:
        warm_max = (int(args.max_frames * 0.6) + args.max_frames // 2
                    if args.mixed else args.max_frames)
        warm(batcher, model, warm_max, text)
        if args.warm_only:
            print(json.dumps({"phase": "warm_only", "device": dev}), flush=True)
            return
        log(f"phase A: {args.requests} requests x {args.max_frames} frames, "
            f"capacity {args.capacity}")
        a = phase_a(batcher, args.requests, args.max_frames, text,
                    mixed=args.mixed)
        a.update({"phase": "A_offline_throughput", "device": dev,
                  "mixed": args.mixed, "depth": args.depth,
                  "capacity": args.capacity, "burst": args.burst,
                  "kv": args.kv, "talker": args.talker,
                  "cp_kernel": not args.no_cp_kernel})
        print(json.dumps(a), flush=True)
        if not args.skip_streams:
            log(f"phase B: {args.streams} streams vs busy batch")
            b = phase_b(batcher, args.streams,
                        min(args.capacity, args.requests), args.max_frames,
                        text)
            b.update({"phase": "B_stream_join_latency", "device": dev,
                      "capacity": args.capacity})
            print(json.dumps(b), flush=True)
    finally:
        batcher.shutdown()


if __name__ == "__main__":
    main()
