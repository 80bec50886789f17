"""EMA vector-quantization TRAINING machinery (kmeans init, EMA codebook
update, dead-code expiry, commitment loss) — functional JAX port of the
Meta/EnCodec-lineage trainer the reference carries for its VQ stacks
(reference core_vq.py:60-248: `kmeans`, `EuclideanCodebook.init_embed_`,
`expire_codes_`, the EMA `forward`, and `VectorQuantization.forward`'s
straight-through + commitment loss).

The inference codecs in this repo consume checkpoints storing
`embedding_sum` / `cluster_usage` (codec_decoder.py:85-97); training state
here keeps the same quantities (`embed_avg` / `cluster_size` in reference
naming) plus the normalized `embed`, and `to_checkpoint` converts back, so a
codebook trained with this module round-trips through the inference path.

Everything is functional and jit/pmap-safe: no data-dependent Python control
flow (init/expiry are masked selects), and multi-worker sync is just "run
under pjit with replicated state" — the reference's commented-out
`distrib.broadcast_tensors` calls (core_vq.py:161-162, 183-184) are what GSPMD
replication gives for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VQTrainState(NamedTuple):
    """EMA codebook training state (reference buffers, core_vq.py:176-181)."""

    inited: jax.Array        # () bool
    cluster_size: jax.Array  # (K,) float32 EMA usage
    embed: jax.Array         # (K, D) normalized codebook
    embed_avg: jax.Array     # (K, D) EMA sum


def init_vq_state(key: jax.Array, codebook_size: int, dim: int) -> VQTrainState:
    """Kaiming-uniform init (reference uniform_init, core_vq.py:60-63);
    replaced by kmeans on the first training batch when kmeans_init is on."""
    bound = jnp.sqrt(3.0) * jnp.sqrt(2.0 / dim)
    embed = jax.random.uniform(key, (codebook_size, dim), jnp.float32,
                               -bound, bound)
    return VQTrainState(
        inited=jnp.asarray(False),
        cluster_size=jnp.zeros((codebook_size,), jnp.float32),
        embed=embed,
        embed_avg=embed,
    )


def sample_vectors(key: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """`num` rows from samples — permutation without replacement when enough
    rows, uniform with replacement otherwise (core_vq.py:66-74). Static-shape:
    both draws are computed and selected by count."""
    n = samples.shape[0]
    perm = jax.random.permutation(key, n)
    idx_perm = perm[jnp.arange(num) % n]
    idx_rand = jax.random.randint(key, (num,), 0, n)
    idx = jnp.where(n >= num, idx_perm, idx_rand)
    return samples[idx]


def _sq_dists(x: jax.Array, means: jax.Array) -> jax.Array:
    """Negative squared euclidean distances (reference quantize/kmeans form)."""
    return -(jnp.sum(x * x, axis=1, keepdims=True)
             - 2.0 * x @ means.T
             + jnp.sum(means * means, axis=1)[None, :])


def kmeans(key: jax.Array, samples: jax.Array, num_clusters: int,
           num_iters: int = 10) -> tuple[jax.Array, jax.Array]:
    """K-means on one batch (core_vq.py:77-101): sampled init, argmax
    assignment, bin means with empty-cluster carry-over.
    Returns (means (K, D), bins (K,))."""
    samples = samples.astype(jnp.float32)
    means0 = sample_vectors(key, samples, num_clusters)

    def body(_, means):
        buckets = jnp.argmax(_sq_dists(samples, means), axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32)
        bins = jnp.sum(onehot, axis=0)
        sums = onehot.T @ samples
        new_means = sums / jnp.clip(bins, 1.0, None)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means0)
    buckets = jnp.argmax(_sq_dists(samples, means), axis=-1)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32), axis=0)
    return means, bins


def kmeans_init(state: VQTrainState, key: jax.Array,
                x: jax.Array, num_iters: int = 10) -> VQTrainState:
    """First-batch kmeans init, masked no-op once inited (core_vq.py:152-163).

    Deliberate fix over the reference: it seeds `embed_avg` with the raw
    means while `cluster_size` gets the bin counts (core_vq.py:156-159), so
    the first EMA normalization (`embed = embed_avg / cluster_size`)
    collapses the codebook by ~bin-count x until the EMA re-accumulates
    (~1/(1-decay) steps of garbage assignments). Seeding
    `embed_avg = means * bins` makes the normalized codebook equal the
    kmeans means from step one; the steady state is identical."""
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    embed, bins = kmeans(key, flat, state.embed.shape[0], num_iters)

    def pick(new, old):
        return jnp.where(state.inited, old, new)

    return VQTrainState(
        inited=jnp.asarray(True),
        cluster_size=pick(bins, state.cluster_size),
        embed=pick(embed, state.embed),
        embed_avg=pick(embed * jnp.clip(bins, 1.0, None)[:, None],
                       state.embed_avg),
    )


def expire_dead_codes(state: VQTrainState, key: jax.Array, x: jax.Array,
                      threshold: float = 2.0) -> tuple[VQTrainState, jax.Array]:
    """Replace codes whose normalized EMA usage < threshold with random batch
    vectors (core_vq.py:165-184). Returns (state, num_expired)."""
    if threshold == 0.0:
        return state, jnp.asarray(0, jnp.int32)
    k = state.embed.shape[0]
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    norm_usage = state.cluster_size / jnp.clip(
        jnp.sum(state.cluster_size), 1e-12, None) * k
    expired = norm_usage < threshold
    repl = sample_vectors(key, flat, k)
    embed = jnp.where(expired[:, None], repl, state.embed)
    return state._replace(embed=embed), jnp.sum(expired.astype(jnp.int32))


def quantize(embed: jax.Array, x: jax.Array) -> jax.Array:
    """Nearest-codebook indices (core_vq.py:186-194)."""
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    idx = jnp.argmax(_sq_dists(flat, embed.astype(jnp.float32)), axis=-1)
    return idx.reshape(x.shape[:-1])


def dequantize(embed: jax.Array, indices: jax.Array) -> jax.Array:
    return embed[indices]


def ema_update(state: VQTrainState, x: jax.Array, indices: jax.Array,
               decay: float = 0.99, epsilon: float = 1e-5) -> VQTrainState:
    """EMA codebook update (core_vq.py:234-246): usage and sum EMAs, then
    laplace-smoothed normalization into `embed`."""
    k = state.embed.shape[0]
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    onehot = jax.nn.one_hot(indices.reshape(-1), k, dtype=jnp.float32)
    cluster_size = state.cluster_size * decay + jnp.sum(onehot, 0) * (1 - decay)
    embed_sum = onehot.T @ flat
    embed_avg = state.embed_avg * decay + embed_sum * (1 - decay)
    n = jnp.sum(cluster_size)
    smoothed = (cluster_size + epsilon) / (n + k * epsilon) * n
    embed = embed_avg / smoothed[:, None]
    return VQTrainState(inited=state.inited, cluster_size=cluster_size,
                        embed=embed, embed_avg=embed_avg)


def vq_train_step(state: VQTrainState, key: jax.Array, x: jax.Array,
                  decay: float = 0.99, epsilon: float = 1e-5,
                  threshold_ema_dead_code: float = 2.0,
                  kmeans_iters: int = 10,
                  commitment_weight: float = 1.0):
    """One training forward (reference EuclideanCodebook.forward +
    VectorQuantization.forward, core_vq.py:218-248, 367-390): kmeans-init on
    first batch -> dead-code expiry -> quantize -> EMA update; returns the
    straight-through quantized tensor, indices, commitment loss, new state.
    """
    k_init, k_exp = jax.random.split(key)
    state = kmeans_init(state, k_init, x, kmeans_iters)
    state, n_expired = expire_dead_codes(state, k_exp, x,
                                         threshold_ema_dead_code)
    idx = quantize(state.embed, x)
    q = dequantize(state.embed, idx)
    state = ema_update(state, x, idx, decay, epsilon)
    # straight-through estimator + commitment loss (core_vq.py:377-387)
    q_st = x + jax.lax.stop_gradient(q.astype(x.dtype) - x)
    commit = commitment_weight * jnp.mean(
        jnp.square(jax.lax.stop_gradient(q.astype(jnp.float32))
                   - x.astype(jnp.float32)))
    return q_st, idx, commit, state, n_expired


def residual_vq_train_step(states: list, key: jax.Array, x: jax.Array,
                           n_q: int | None = None, **kw):
    """Residual VQ training pass (reference
    DistributedResidualVectorQuantization, core_vq.py:334-474): each stage
    quantizes the previous residual; losses are averaged."""
    n_q = n_q or len(states)
    residual = x
    quantized = jnp.zeros_like(x)
    out_states, codes, losses = [], [], []
    for i, st in enumerate(states):
        if i >= n_q:
            out_states.append(st)
            continue
        key, sub = jax.random.split(key)
        q, idx, loss, st2, _ = vq_train_step(st, sub, residual, **kw)
        residual = residual - jax.lax.stop_gradient(q)
        quantized = quantized + q
        out_states.append(st2)
        codes.append(idx)
        losses.append(loss)
    return (quantized, jnp.stack(codes, axis=-1),
            jnp.mean(jnp.stack(losses)), out_states)


def to_checkpoint(state: VQTrainState) -> dict:
    """Convert training state to the inference checkpoint quantities
    (embedding_sum / cluster_usage, see codec_decoder.py:85-97)."""
    return {"embedding_sum": state.embed_avg,
            "cluster_usage": state.cluster_size}
