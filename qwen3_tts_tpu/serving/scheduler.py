"""Continuous batching for TTS serving.

Requests join and leave a persistent fixed-capacity decode batch at frame
boundaries, instead of serializing whole utterances (the reference serves
via a gradio queue — whole-request serialization). TPU-friendly design:

- ONE persistent TalkerState of capacity B with a shared cache write index.
  A joining request is right-aligned to the current index: its prompt is
  prefilled into its slot's cache rows ending exactly at `index`, so every
  slot shares the same static-shape decode program. Positions beyond the
  prompt that predate the join are masked per-slot; cache slots ahead of the
  index hold garbage that is overwritten before it ever becomes visible
  (decode writes slot i before any query reads it).
- Admission prefill is bucketed: the prompt is padded to the next
  power-of-two window ending at the shared index and prefilled through a
  per-width jitted program, so short prompts do not pay a full-cache-width
  forward (a handful of compilations total, reused forever).
- Per-slot `step` vectors (see TalkerState) let slots sit at different
  generation depths inside one jitted burst.
- When the batch drains or the cache fills, the state resets to index 0.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.talker import (TalkerState, talker_decode_step, talker_spec)
from ..nn.cache import KVCache
from ..nn.rope import make_inv_freq, rope_cos_sin
from ..nn.sampling import (BatchedSampling, SamplingConfig, make_suppress_mask,
                           process_logits, sample_token)
from ..nn.transformer import cache_attention_mask, stack_forward


class BatcherOverloaded(RuntimeError):
    """Raised by submit(block=False) when the admission queue is full.
    Serving maps this to HTTP 503 + Retry-After (overload sheds load at the
    door instead of growing host memory and tail latency without bound)."""


@dataclass
class _Request:
    prompt: object              # AssembledPrompt (b=1)
    max_frames: int
    sampling: SamplingConfig
    sub_sampling: SamplingConfig = None  # per-request sub-talker knobs
    future: Future = field(default_factory=Future)
    frames: list = field(default_factory=list)
    slot: int = -1
    stream_q: Optional[queue.Queue] = None  # set for streamed requests
    deadline: Optional[float] = None        # monotonic admission deadline
    hit_eos: bool = False                   # its stream sampled codec EOS
    # caller-thread-prepared join inputs (see _prep_request)
    w: int = 0
    n_valid: int = 0
    embeds_w: object = None
    row_mask_w: object = None
    trailing_row: object = None
    pad_np: object = None


class ContinuousBatcher:
    """Slot-based continuous batching over the fused decode step."""

    def __init__(self, model, capacity: int = 8, cache_len: int = 1024,
                 burst_frames: int = 8,
                 sampling: Optional[SamplingConfig] = None,
                 sub_sampling: Optional[SamplingConfig] = None,
                 kv_cache_dtype=None, max_queue: Optional[int] = None,
                 vocode_batch: int = 32, pipeline_depth: int = 1,
                 _start_thread: bool = True):
        self.model = model
        self.cfg = model.config.talker
        self.spec = talker_spec(self.cfg)
        self.capacity = capacity
        self.cache_len = cache_len
        self.burst_frames = burst_frames
        self.sampling = sampling or SamplingConfig()
        self.sub_sampling = sub_sampling or SamplingConfig()
        self.suppress = make_suppress_mask(self.cfg.vocab_size, 1024,
                                           (self.cfg.codec_eos_token_id,))
        self.dtype = model.dtype
        # opt-in int8 KV cache for the persistent decode batch: halves the
        # dominant HBM term of the serving step (the BENCH headline config;
        # quality budget gated by eval/run_baseline --quant-ab)
        if isinstance(kv_cache_dtype, str):
            kv_cache_dtype = {"int8": jnp.int8}[kv_cache_dtype]
        self.kv_cache_dtype = kv_cache_dtype or self.dtype
        self.trailing_cap = 256  # max trailing-text length per request

        # bounded admission queue (r4 verdict weak #5): default bound 4x
        # capacity — enough to keep the batch full across drains, small
        # enough that overload is shed at submit() instead of accumulating
        self.max_queue = (4 * capacity) if max_queue is None else max_queue
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=self.max_queue)
        self._backlog: list[_Request] = []  # deferred until the batch drains
        self._join_fns: dict[int, object] = {}
        self._active: dict[int, _Request] = {}
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._reset_state()
        # finished requests vocode on a separate thread, in padded BATCHES
        # (b=1 vocoding is ~3x slower per audio-second than b=32, BENCH r4),
        # so the decode worker never stalls on the vocoder between bursts
        # bursts kept in flight before harvesting the oldest (>=1). Depth 2
        # hides a full result round trip per cycle on high-latency links
        # (the RPC-tunneled TPU pays 25-100 ms per fetch) at the cost of
        # one more burst of admission/EOS lag.
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self.vocode_batch = vocode_batch
        self._vocode_q: "queue.Queue" = queue.Queue()
        self._vocoder_thread = threading.Thread(target=self._vocode_worker,
                                                daemon=True)
        self.stats: dict = {}  # worker-loop phase accounting (see _run)
        # _start_thread=False: callers (tests, the multichip dryrun) drive
        # _admit/_burst_fn/_harvest deterministically without the worker
        self._thread = threading.Thread(target=self._run, daemon=True)
        if _start_thread:
            self._thread.start()
            self._vocoder_thread.start()

    # ------------------------------------------------------------------ API

    def _make_request(self, text, speaker, language, instruct, max_frames,
                      do_sample, top_k, top_p, temperature,
                      repetition_penalty, subtalker_dosample=None,
                      subtalker_top_k=None, subtalker_top_p=None,
                      subtalker_temperature=None, stream_q=None) -> _Request:
        from ..models.generation import assemble_prompts

        model = self.model
        base = self.sampling
        samp = SamplingConfig(
            do_sample=base.do_sample if do_sample is None else bool(do_sample),
            top_k=base.top_k if top_k is None else int(top_k),
            top_p=base.top_p if top_p is None else float(top_p),
            temperature=(base.temperature if temperature is None
                         else float(temperature)),
            repetition_penalty=(base.repetition_penalty
                                if repetition_penalty is None
                                else float(repetition_penalty)))
        sbase = self.sub_sampling
        sub = SamplingConfig(
            do_sample=(sbase.do_sample if subtalker_dosample is None
                       else bool(subtalker_dosample)),
            top_k=(sbase.top_k if subtalker_top_k is None
                   else int(subtalker_top_k)),
            top_p=(sbase.top_p if subtalker_top_p is None
                   else float(subtalker_top_p)),
            temperature=(sbase.temperature if subtalker_temperature is None
                         else float(subtalker_temperature)),
            repetition_penalty=1.0)
        input_ids = model._tokenize_texts([model._build_assistant_text(text)])
        instruct_ids = None
        if instruct:
            instruct_ids = [model._tokenize_texts(
                [model._build_instruct_text(instruct)])[0]]
        prompt = assemble_prompts(model.talker_params, model.config, input_ids,
                                  [language], [speaker] if speaker else None,
                                  instruct_ids, non_streaming_mode=False)
        t_tr = prompt.trailing_text_hidden.shape[1]
        if t_tr > self.trailing_cap:
            raise ValueError(
                f"trailing text length {t_tr} exceeds the batcher's "
                f"trailing_cap {self.trailing_cap}; raise trailing_cap at "
                f"construction or shorten the text")
        req = _Request(prompt=prompt, max_frames=max_frames, sampling=samp,
                       sub_sampling=sub, stream_q=stream_q)
        # observability: callers holding only the future can reach the
        # request (delivered frame counts, slot) without a side channel
        req.future.request = req
        # pre-pad the prompt to its bucket width HERE, on the caller thread:
        # admission used to build these with ~10 device ops per join on the
        # worker thread — each a full RPC round trip (25-100 ms dispatch
        # floor), measured at ~0.32 s/join = 45% of serving wall-clock
        # (serve_measure r5). Caller threads absorb the one host fetch in
        # parallel; the worker then makes exactly ONE dispatch per join.
        self._prep_request(req)
        return req

    def _prep_request(self, req: _Request):
        """Host-side (numpy) bucket-padded join inputs; ships with the join
        dispatch. Also used lazily by _admit for directly-constructed
        requests (multichip dryrun)."""
        p = req.prompt
        t_p = p.inputs_embeds.shape[1]
        decode_room = self.cache_len - 2 * self.burst_frames
        if t_p >= decode_room:
            err = ValueError(
                f"prompt length {t_p} does not fit cache_len "
                f"{self.cache_len} (need < {decode_room})")
            if req.stream_q is not None:
                req.stream_q.put(err)
            req.future.set_exception(err)
            req.prompt = None  # dead request: submit/admit skip it
            return
        w = min(self._bucket(t_p), decode_room)
        n_valid = int(np.asarray(p.attention_mask).sum())
        h = self.cfg.hidden_size
        dt = np.asarray(jnp.zeros((0,), self.dtype)).dtype  # ml_dtypes bf16
        embeds_w = np.zeros((1, w, h), dt)
        embeds_w[:, w - t_p:] = np.asarray(p.inputs_embeds, dt)
        row_mask_w = np.zeros((1, w), np.int32)
        row_mask_w[:, w - n_valid:] = 1
        trailing_row = np.zeros((self.trailing_cap, h), dt)
        t_tr = p.trailing_text_hidden.shape[1]  # <= trailing_cap (checked)
        trailing_row[:t_tr] = np.asarray(p.trailing_text_hidden[0], dt)
        pad_np = np.asarray(p.tts_pad_embed, dt)
        trailing_row[t_tr:] = pad_np[0]
        req.w, req.n_valid = w, n_valid
        req.embeds_w, req.row_mask_w = embeds_w, row_mask_w
        req.trailing_row, req.pad_np = trailing_row, pad_np

    def submit(self, text: str, speaker: Optional[str] = None,
               language: str = "auto", instruct: Optional[str] = None,
               max_frames: int = 256, do_sample: Optional[bool] = None,
               top_k: Optional[int] = None, top_p: Optional[float] = None,
               temperature: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               subtalker_dosample: Optional[bool] = None,
               subtalker_top_k: Optional[int] = None,
               subtalker_top_p: Optional[float] = None,
               subtalker_temperature: Optional[float] = None,
               block: bool = True, timeout: Optional[float] = None,
               deadline_s: Optional[float] = None) -> Future:
        """Enqueue a synthesis request; resolves to (wav np.ndarray, sr).

        Talker AND sub-talker sampling knobs are honored per request, like
        the reference's per-call kwargs (qwen3_tts_model.py:287-352): both
        ride per-slot traced arrays inside the shared decode program
        (do_sample=False maps to top_k=1, which equals argmax; the frame
        megakernel takes the same per-row knobs as traced inputs).

        Backpressure: the admission queue is bounded (`max_queue`).
        block=True (default) waits for room (optionally up to `timeout`
        seconds); block=False raises BatcherOverloaded immediately when
        full — the server maps that to 503 + Retry-After. `deadline_s`
        bounds time-to-admission: a request still queued past its deadline
        fails with TimeoutError instead of decoding audio nobody is
        waiting for."""
        req = self._make_request(text, speaker, language, instruct, max_frames,
                                 do_sample, top_k, top_p, temperature,
                                 repetition_penalty, subtalker_dosample,
                                 subtalker_top_k, subtalker_top_p,
                                 subtalker_temperature)
        if req.prompt is None:  # rejected at prep (too-long prompt)
            return req.future
        if deadline_s is not None:
            req.deadline = time.monotonic() + deadline_s
        try:
            self._queue.put(req, block=block, timeout=timeout)
        except queue.Full:
            raise BatcherOverloaded(
                f"admission queue full ({self.max_queue} waiting; "
                f"{len(self._active)}/{self.capacity} slots active)") from None
        self._wake.set()
        return req.future

    def submit_stream(self, text: str, speaker: Optional[str] = None,
                      language: str = "auto", instruct: Optional[str] = None,
                      max_frames: int = 256, emit_chunk_frames: int = 4,
                      left_context: int = 25, do_sample: Optional[bool] = None,
                      top_k: Optional[int] = None, top_p: Optional[float] = None,
                      temperature: Optional[float] = None,
                      repetition_penalty: Optional[float] = None,
                      subtalker_dosample: Optional[bool] = None,
                      subtalker_top_k: Optional[int] = None,
                      subtalker_top_p: Optional[float] = None,
                      subtalker_temperature: Optional[float] = None,
                      block: bool = True, timeout: Optional[float] = None,
                      deadline_s: Optional[float] = None):
        """Streaming submit: returns a generator of float32 audio chunks.
        Frames stream out of the shared batch at burst granularity and are
        vocoded incrementally (reference chunked-decode semantics), so first
        audio arrives while the request is still batched. Backpressure knobs
        (block/timeout/deadline_s) behave like submit()."""
        from ..inference.streaming import vocode_range

        stream_q: queue.Queue = queue.Queue()
        req = self._make_request(text, speaker, language, instruct, max_frames,
                                 do_sample, top_k, top_p, temperature,
                                 repetition_penalty, subtalker_dosample,
                                 subtalker_top_k, subtalker_top_p,
                                 subtalker_temperature, stream_q=stream_q)
        if deadline_s is not None:
            req.deadline = time.monotonic() + deadline_s
        try:
            if req.prompt is not None:  # dead request: gen() raises from
                # the stream_q error sentinel _prep_request posted
                self._queue.put(req, block=block, timeout=timeout)
        except queue.Full:
            raise BatcherOverloaded(
                f"admission queue full ({self.max_queue} waiting; "
                f"{len(self._active)}/{self.capacity} slots active)") from None
        self._wake.set()

        def gen():
            frames_buf: list[np.ndarray] = []
            emitted = 0
            done = False
            while not done:
                item = stream_q.get()
                if isinstance(item, Exception):
                    raise item
                if item is None:
                    done = True
                else:
                    frames_buf.append(item)
                total = sum(len(f) for f in frames_buf)
                step = max(emit_chunk_frames, 1)
                while (total - emitted >= step) or (done and total > emitted):
                    end = min(emitted + step, total)
                    chunk = vocode_range(self.model, np.concatenate(frames_buf),
                                         emitted, end, left_context)
                    emitted = end
                    yield chunk

        return gen()

    def shutdown(self):
        self._stop = True
        self._wake.set()
        if self._thread.is_alive():
            self._thread.join(timeout=30)
        if self._vocoder_thread.is_alive():
            self._vocode_q.put(None)  # stop sentinel, after remaining work
            self._vocoder_thread.join(timeout=60)

    # ----------------------------------------------------------- device ops

    def _reset_state(self):
        b = self.capacity
        cache = KVCache.create(self.spec.num_layers, b, self.cache_len,
                               self.spec.num_kv_heads, self.spec.head_dim,
                               dtype=self.kv_cache_dtype)
        # a fresh batch starts at index 1 so joins always have >= 1 position
        self.state = TalkerState(
            cache=cache._replace(index=jnp.asarray(1, jnp.int32)),
            token0=jnp.zeros((b,), jnp.int32),
            past_hidden=jnp.zeros((b, self.cfg.hidden_size), self.dtype),
            seen=jnp.zeros((b, self.cfg.vocab_size), bool),
            done=jnp.ones((b,), bool),
            key=jax.random.PRNGKey(np.random.randint(0, 2**31)),
            step=jnp.zeros((b,), jnp.int32),
            num_pads=jnp.zeros((b,), jnp.int32),
        )
        self.pad_mask = jnp.zeros((b, self.cache_len), jnp.int32)
        self.trailing = jnp.zeros((b, self.trailing_cap, self.cfg.hidden_size),
                                  self.dtype)
        self.pad_embed = jnp.zeros((1, self.cfg.hidden_size), self.dtype)
        # host mirror of the shared cache write index: joins advance it by
        # `advance`, bursts by burst_frames — the worker never fetches the
        # device scalar (each int() was an RPC round trip)
        self._host_index = 1
        # per-slot talker + sub-talker sampling knobs (traced inputs of the
        # shared program; the reference honors subtalker_* per call,
        # qwen3_tts_model.py:287-352)
        self.samp = BatchedSampling.broadcast(self.sampling, b)
        self.sub_samp = BatchedSampling.broadcast(self.sub_sampling, b)

    def _bucket(self, t: int) -> int:
        """Smallest power-of-two window >= t (min 32, capped at cache_len)."""
        w = 32
        while w < t:
            w *= 2
        return min(w, self.cache_len)

    def _join_fn(self, w: int, k: int = 1):
        """Jitted join program per (window width, group size) bucket.

        Admits K requests in ONE program execution: depth-pipelining cannot
        hide per-program runtime overhead because it serializes on the
        device queue (r5 depth sweep: no gain at depth 2/3), so the win is
        fewer programs — grouped admissions cut join program count ~K-fold.
        Padding rows (group smaller than the K bucket) REPLICATE the last
        request — every write is idempotent (same slot, same values, same
        fold_in(key, slot) sample), so duplicates are harmless."""
        if (w, k) in self._join_fns:
            return self._join_fns[(w, k)]
        spec, cfg = self.spec, self.cfg
        s_max = self.cache_len

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
        def join(params, state: TalkerState, pad_mask, trailing_buf,
                 samp: BatchedSampling, sub_samp: BatchedSampling,
                 embeds, row_mask, trailing_rows, slots, advance, key,
                 knobs):
            """embeds (K,w,H), row_mask (K,w), trailing_rows (K,cap,H),
            slots (K,), knobs (8,K): talker temp/top_k/top_p/rep then the
            sub-talker four. Prefills the K windows (all ending at the
            advanced shared index) and installs their KV rows, sampling
            knobs, and first tokens — one dispatch for the whole group
            (index advance + gap invalidation folded in too)."""
            idx0 = state.cache.index
            state = state._replace(cache=state.cache._replace(
                index=idx0 + advance))
            col = jnp.arange(s_max)
            gap = (col >= idx0) & (col < idx0 + advance)
            pad_mask = jnp.where(gap[None, :], 0, pad_mask)
            t_topk = knobs[1].astype(jnp.int32)
            s_topk = knobs[5].astype(jnp.int32)
            group_samp = BatchedSampling(
                temperature=knobs[0], top_k=t_topk, top_p=knobs[2],
                repetition_penalty=knobs[3])
            samp = BatchedSampling(
                temperature=samp.temperature.at[slots].set(knobs[0]),
                top_k=samp.top_k.at[slots].set(t_topk),
                top_p=samp.top_p.at[slots].set(knobs[2]),
                repetition_penalty=samp.repetition_penalty.at[slots].set(
                    knobs[3]))
            sub_samp = BatchedSampling(
                temperature=sub_samp.temperature.at[slots].set(knobs[4]),
                top_k=sub_samp.top_k.at[slots].set(s_topk),
                top_p=sub_samp.top_p.at[slots].set(knobs[6]),
                repetition_penalty=sub_samp.repetition_penalty.at[slots].set(
                    knobs[7]))
            inv = make_inv_freq(spec.head_dim, spec.rope_theta)
            positions = jnp.maximum(jnp.cumsum(row_mask, axis=-1) - 1, 0)
            cos, sin = rope_cos_sin(positions, inv, embeds.dtype)
            row_cache = KVCache.create(spec.num_layers, k, w,
                                       spec.num_kv_heads, spec.head_dim,
                                       dtype=self.dtype)
            mask = cache_attention_mask(row_mask, w, row_cache.index, w,
                                        spec.sliding_window)
            h, row_cache = stack_forward(spec, params["layers"], embeds,
                                         cos, sin, mask, row_cache)
            idx = state.cache.index
            last_h = h[:, -1]  # (K, H): every window ends at the index
            from ..models.talker import _head

            logits = _head(params, "codec_head", last_h).astype(jnp.float32)
            seen_rows = jnp.zeros((k, cfg.vocab_size), bool)
            proc = process_logits(logits, group_samp, seen_rows,
                                  self.suppress, cfg.codec_eos_token_id,
                                  jnp.ones((k,), bool))
            # per-row keys fold in the SLOT id: padding duplicates share a
            # slot, therefore a key, therefore sample the same token
            row_keys = jax.vmap(lambda sl: jax.random.fold_in(key, sl))(slots)
            token0 = jax.vmap(
                lambda rk, lg: sample_token(rk, lg[None], True)[0]
            )(row_keys, proc)

            n_valid = jnp.sum(row_mask, axis=-1)          # (K,)
            start = idx - w  # guaranteed >= 0 by admission (index advance)
            new_cache = state.cache
            if state.cache.quantized:
                # int8 persistent cache: the bf16 prefill rows are quantized
                # per slot on install (values + per-slot scales), same scheme
                # as the decode step's in-place writes (nn/cache.quantize_kv)
                from ..nn.cache import quantize_kv

                k_q, k_sc = quantize_kv(row_cache.k)
                v_q, v_sc = quantize_kv(row_cache.v)
            else:
                k_q = row_cache.k.astype(state.cache.k.dtype)
                v_q = row_cache.v.astype(state.cache.v.dtype)
                k_sc = v_sc = None
            for i in range(k):  # static unroll: K <= 8 slot installs
                sl = slots[i]
                if k_sc is not None:
                    new_cache = new_cache._replace(
                        k_scale=jax.lax.dynamic_update_slice(
                            new_cache.k_scale, k_sc[:, i:i + 1],
                            (0, sl, start, 0)),
                        v_scale=jax.lax.dynamic_update_slice(
                            new_cache.v_scale, v_sc[:, i:i + 1],
                            (0, sl, start, 0)))
                new_cache = new_cache._replace(
                    k=jax.lax.dynamic_update_slice(
                        new_cache.k, k_q[:, i:i + 1], (0, sl, start, 0, 0)),
                    v=jax.lax.dynamic_update_slice(
                        new_cache.v, v_q[:, i:i + 1], (0, sl, start, 0, 0)))
            seen_k = seen_rows.at[jnp.arange(k), token0].set(True)
            new_state = TalkerState(
                cache=new_cache,
                token0=state.token0.at[slots].set(token0),
                past_hidden=state.past_hidden.at[slots].set(last_h),
                seen=state.seen.at[slots].set(seen_k),
                done=state.done.at[slots].set(jnp.zeros((k,), bool)),
                key=jax.random.split(key)[0],
                step=state.step.at[slots].set(jnp.zeros((k,), jnp.int32)),
                num_pads=state.num_pads.at[slots].set(
                    (idx - n_valid).astype(jnp.int32)),
            )
            new_pad_mask = pad_mask.at[slots].set(
                (col[None, :] >= (idx - n_valid)[:, None]).astype(jnp.int32))
            new_trailing = trailing_buf.at[slots].set(trailing_rows)
            return new_state, new_pad_mask, new_trailing, samp, sub_samp

        self._join_fns[(w, k)] = join
        return join

    @functools.cached_property
    def _burst_fn(self):
        cfg = self.cfg

        # state donated: the KV cache aliases in place across bursts instead
        # of copying the full cache every burst (r3 profiling finding).
        # done is returned as a standalone output so the worker can harvest
        # burst k while burst k+1 (holding the donated state) is in flight.
        @functools.partial(jax.jit, donate_argnums=(1,))
        def burst(params, state, trailing, pad_embed, pad_mask, samp,
                  sub_samp):
            def body(carry, _):
                st = carry
                st, frame, _ = talker_decode_step(
                    params, cfg, st, trailing, pad_embed, pad_mask,
                    samp, sub_samp, self.suppress)
                return st, frame
            state, frames = jax.lax.scan(body, state, None,
                                         length=self.burst_frames)
            return state, jnp.transpose(frames, (1, 0, 2)), state.done

        return burst

    # --------------------------------------------------------------- worker

    @staticmethod
    def _knob_vals(cfg: SamplingConfig):
        """SamplingConfig -> the 4 traced knob scalars (greedy == top_k 1)."""
        tk = 1 if not cfg.do_sample else cfg.top_k
        tp = 1.0 if not cfg.do_sample else cfg.top_p
        tmp = 1.0 if not cfg.do_sample else cfg.temperature
        return (np.float32(tmp), np.int32(tk), np.float32(tp),
                np.float32(cfg.repetition_penalty))

    _K_BUCKETS = (1, 2, 4, 8)

    def _admit(self):
        """Admission: ONE device dispatch per GROUP of joins. Up to 8
        same-width-bucket requests prefill in a single batched join program
        (per-program runtime overhead was the dominant serving cost after
        the single-request folding; the r5 depth sweep showed pipelining
        cannot hide it). All shaping happens on the caller thread
        (_prep_request) and the shared write index is mirrored on host
        (`_host_index`), so the worker never blocks on a device fetch."""
        decode_room = self.cache_len - 2 * self.burst_frames
        if (not self._active and self._host_index > 1
                and (self._backlog or not self._queue.empty())):
            # drained with work waiting: reset so joins start fresh instead
            # of being deferred (or truncated) against a spent cache
            self._reset_state()
        stop = False
        while (not stop and len(self._active) < self.capacity
               and (self._backlog or (not self._queue.empty()
                                      and len(self._backlog) < self.capacity))
               and self._host_index < decode_room):
            group: list[_Request] = []
            while (len(self._active) + len(group) < self.capacity
                   and len(group) < self._K_BUCKETS[-1]
                   # the backlog is bounded: stop pulling from the (bounded)
                   # queue when it holds a full batch of deferred joins, so
                   # in-flight work stays <= capacity + backlog + max_queue
                   and (self._backlog or (not self._queue.empty()
                                          and len(self._backlog)
                                          < self.capacity))):
                req = (self._backlog.pop(0) if self._backlog
                       else self._queue.get())
                if req.deadline is not None \
                        and time.monotonic() > req.deadline:
                    err = TimeoutError(
                        "request missed its admission deadline "
                        "(deadline_s) while queued — shed instead of "
                        "decoding audio nobody is waiting for")
                    if req.stream_q is not None:
                        req.stream_q.put(err)
                        req.future.set_result(None)
                    else:
                        req.future.set_exception(err)
                    continue
                if req.embeds_w is None and req.prompt is not None:
                    self._prep_request(req)  # directly-built req (dryrun)
                if req.prompt is None:
                    continue  # rejected at prep; error already delivered
                if group and req.w != group[0].w:
                    # different width bucket: head of the next group
                    self._backlog.insert(0, req)
                    break
                idx = self._host_index
                w = req.w
                advance = max(w - idx, 0)
                if (advance and (self._active or group)
                        and w > idx + 64):
                    # too disruptive mid-batch: defer until the batch drains
                    self._backlog.insert(0, req)
                    stop = True
                    break
                # admission gating on cache room: admit only if the
                # request's full frame budget fits before the cache end —
                # otherwise it would be truncated mid-utterance by the
                # exhaustion backstop. Deferred joins wait for drain +
                # reset. Requests too long for even a FRESH cache are
                # admitted immediately and truncate at the end (graceful
                # degradation for max_frames > cache_len).
                # slack: one burst of rounding + pipeline_depth bursts of
                # harvest lag (a request reaches max_frames one harvested
                # burst late) + one burst of exhaustion margin
                slack = (3 + self.pipeline_depth) * self.burst_frames
                end_need = idx + advance + req.max_frames + slack
                fits_fresh = (w + req.max_frames + slack <= self.cache_len)
                if (end_need > self.cache_len and fits_fresh
                        and (self._active or group)):
                    self._backlog.insert(0, req)
                    stop = True
                    break
                group.append(req)
            if not group:
                break
            self._join_group(group)

    def _join_group(self, group: list):
        """Install a same-width group of requests via one join dispatch."""
        k_real = len(group)
        kb = next(k for k in self._K_BUCKETS if k >= k_real)
        padded = group + [group[-1]] * (kb - k_real)  # idempotent duplicates
        w = group[0].w
        advance = max(w - self._host_index, 0)
        free = [s for s in range(self.capacity) if s not in self._active]
        slots_real = free[:k_real]
        slots = np.asarray(slots_real + [slots_real[-1]] * (kb - k_real),
                           np.int32)
        embeds = np.concatenate([r.embeds_w for r in padded], axis=0)
        row_mask = np.concatenate([r.row_mask_w for r in padded], axis=0)
        trailing = np.stack([r.trailing_row for r in padded])
        knobs = np.zeros((8, kb), np.float32)
        for j, r in enumerate(padded):
            knobs[:4, j] = [float(v) for v in self._knob_vals(r.sampling)]
            knobs[4:, j] = [float(v) for v in self._knob_vals(r.sub_sampling)]
        # tts_pad_embed is a model constant (same row of codec_embedding
        # for every request), so the batch-global assignment is safe
        self.pad_embed = group[-1].pad_np
        key = jax.random.PRNGKey(np.random.randint(0, 2**31))
        (self.state, self.pad_mask, self.trailing, self.samp,
         self.sub_samp) = self._join_fn(w, kb)(
            self.model.talker_params, self.state, self.pad_mask,
            self.trailing, self.samp, self.sub_samp,
            embeds, row_mask, trailing, slots, np.int32(advance), key,
            knobs)
        self._host_index += advance
        for r, s in zip(group, slots_real):
            r.slot = s
            self._active[s] = r

    def _harvest(self, frames: np.ndarray, done: np.ndarray | None = None,
                 snapshot: dict | None = None):
        """snapshot: slot->request map captured when this burst was
        DISPATCHED (pipelined worker). Slots whose occupant changed since —
        the old request finished at the previous harvest and a new one
        joined — are skipped: this burst's rows describe the old one."""
        if done is None:  # non-pipelined callers (tests)
            done = np.asarray(self.state.done)
        if snapshot is None:
            snapshot = dict(self._active)
        finished = []
        for slot, req in list(snapshot.items()):
            if self._active.get(slot) is not req:
                continue  # slot re-admitted after this burst was dispatched
            fr = frames[slot]  # (burst, groups)
            eos = fr[:, 0] == self.cfg.codec_eos_token_id
            if eos.any():
                req.hit_eos = True
                fr = fr[: int(np.argmax(eos))]  # the EOS frame is not audio
            req.frames.append(fr)
            total = sum(len(f) for f in req.frames)
            over = max(total - req.max_frames, 0)
            if req.stream_q is not None and len(fr) - over > 0:
                req.stream_q.put(fr[: len(fr) - over])  # emit while batched
            if bool(done[slot]) or eos.any() or total >= req.max_frames:
                finished.append(slot)
        if finished:
            # ONE batched done-update (per-slot .at[].set calls were one
            # device dispatch each over the RPC tunnel); applied to the
            # possibly-in-flight state, i.e. before the next-next burst
            fin = np.zeros((self.capacity,), bool)
            fin[finished] = True
            self.state = self.state._replace(
                done=jnp.logical_or(self.state.done, jnp.asarray(fin)))
        for slot in finished:
            self._finish_request(slot)

    def _finish_request(self, slot: int):
        """Resolve one active request from its harvested frames (also used
        for clean truncation on cache exhaustion)."""
        req = self._active.pop(slot)
        if req.stream_q is not None:
            req.stream_q.put(None)  # end-of-stream sentinel
            req.future.set_result(None)
            return
        codes = np.concatenate(req.frames) if req.frames else \
            np.zeros((0, self.cfg.num_code_groups), np.int64)
        codes = codes[: req.max_frames].astype(np.int64)
        if self._vocoder_thread.is_alive():
            # batched off-thread vocode: the decode worker moves straight
            # to the next burst instead of stalling on the vocoder
            self._vocode_q.put((req, codes))
        else:
            # deterministic single-thread mode (tests, dryrun)
            self._vocode_requests([(req, codes)])

    # ------------------------------------------------------------- vocoding

    _ROW_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)

    def _vocode_requests(self, items: list):
        """Vocode a batch of finished requests' code streams in one padded
        decode call. Shapes are BUCKETED (time padded to 75-frame multiples
        with zero frames — the tokenizer trims them exactly like the
        reference's pad-then-trim decode, modeling_..._v2.py:992-1022 — and
        rows padded to a fixed bucket set with all-zero rows) so sustained
        serving sees a bounded set of vocoder compilations instead of one
        per ragged length combination."""
        try:
            t_max = max(max(len(c) for _, c in items), 1)
            t_pad = -(-t_max // 75) * 75
            k = items[0][1].shape[1] if items[0][1].ndim == 2 else \
                self.cfg.num_code_groups
            rows = next(r for r in self._ROW_BUCKETS + (len(items),)
                        if r >= len(items))
            batch = [np.zeros((t_pad, k), np.int64) for _ in range(rows)]
            for i, (_, codes) in enumerate(items):
                batch[i][:len(codes)] = codes
            out = self.model.speech_tokenizer.decode(
                [{"audio_codes": c} for c in batch])
            sr = self.model.speech_tokenizer.get_output_sample_rate()
            for (req, _), wav in zip(items, out.audio_values):
                req.future.set_result((wav, sr))
        except Exception as e:  # noqa: BLE001
            if len(items) == 1:
                items[0][0].future.set_exception(e)
            else:
                # attribute the failure: retry per item
                for item in items:
                    self._vocode_requests([item])

    def _vocode_worker(self):
        """Drains finished requests and vocodes them in length-bucketed
        batches of <= vocode_batch (b=1 vocoding wastes ~3x device time per
        audio-second vs batched; unbounded batches of long utterances OOM —
        r4 NOTES). Bucketing keeps padding waste <= ~1.5x."""
        while True:
            item = self._vocode_q.get()
            if item is None:
                return
            pending = [item]
            while len(pending) < 4 * self.vocode_batch:
                try:
                    nxt = self._vocode_q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._vocode_q.put(None)  # re-post the stop sentinel
                    break
                pending.append(nxt)
            pending.sort(key=lambda it: len(it[1]), reverse=True)
            while pending:
                lead = max(len(pending[0][1]), 1)
                bucket = [pending.pop(0)]
                while (pending and len(bucket) < self.vocode_batch
                       and len(pending[0][1]) >= lead / 1.5):
                    bucket.append(pending.pop(0))
                self._vocode_requests(bucket)

    def _run(self):
        # worker-loop phase accounting (observability + perf reconciliation:
        # where serving wall-clock goes — admission prefills, burst
        # dispatch, the device sync on the burst result, host harvest).
        #
        # PIPELINED (r5): the worker dispatches burst k+1 BEFORE harvesting
        # burst k, so the device always has the next burst queued while the
        # host does bookkeeping — without this, every burst paid the RPC
        # dispatch floor (25-100 ms) as device idle. Burst k's frames and
        # done flags are standalone outputs, safe to fetch while state k is
        # already donated into burst k+1. Consequences: a slot freed by
        # harvest k is reused only at the next admit (one-burst lag), and a
        # max-frames-terminated slot decodes one extra burst of ignored
        # frames.
        st = self.stats = {"admit_s": 0.0, "dispatch_s": 0.0, "sync_s": 0.0,
                           "harvest_s": 0.0, "idle_s": 0.0, "bursts": 0,
                           "frames": 0, "admitted": 0}
        pending: list = []  # (frames_dev, done_dev, slot_snapshot) FIFO

        def harvest_oldest():
            frames_dev, done_dev, snapshot = pending.pop(0)
            t_s = time.perf_counter()
            frames_host = np.asarray(frames_dev)  # sync on that burst only
            done_host = np.asarray(done_dev)
            t_h = time.perf_counter()
            st["sync_s"] += t_h - t_s
            self._harvest(frames_host, done_host, snapshot)
            st["harvest_s"] += time.perf_counter() - t_h
            st["bursts"] += 1
            st["frames"] += len(snapshot) * self.burst_frames

        while not self._stop:
            t0 = time.perf_counter()
            with self._lock:
                n_before = len(self._active)
                self._admit()
                st["admitted"] += len(self._active) - n_before
            t1 = time.perf_counter()
            st["admit_s"] += t1 - t0
            dispatched = False
            if self._active:
                self.state, frames_dev, done_dev = self._burst_fn(
                    self.model.talker_params, self.state, self.trailing,
                    self.pad_embed, self.pad_mask, self.samp, self.sub_samp)
                self._host_index += self.burst_frames
                # snapshot slot->request AT DISPATCH: by harvest time a slot
                # may already hold a newer request (joined between dispatch
                # and harvest), whose frames/done flags this burst does NOT
                # describe — harvesting against live _active attributed the
                # previous occupant's done=True to the new request and
                # finished it at ~1 burst of frames (r5 measurement bug)
                pending.append((frames_dev, done_dev, dict(self._active)))
                dispatched = True
            st["dispatch_s"] += time.perf_counter() - t1
            while len(pending) > (self.pipeline_depth if dispatched else 0):
                harvest_oldest()
            if not dispatched:
                t4 = time.perf_counter()
                if not self._active:
                    if self._host_index > 1:
                        self._reset_state()
                    self._wake.wait(timeout=0.1)
                    self._wake.clear()
                st["idle_s"] += time.perf_counter() - t4
                continue
            if self._host_index >= self.cache_len - self.burst_frames - 1:
                # cache exhausted: finish any still-active requests with the
                # frames they have (clean truncation — continuing would
                # clamp KV writes at the last column and emit garbage),
                # drop the in-flight bursts, start a fresh batch
                if self._active:
                    for slot in list(self._active):
                        self._finish_request(slot)
                pending.clear()
                self._reset_state()
