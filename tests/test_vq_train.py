"""VQ training machinery tests (nn/vq.py): kmeans init, EMA convergence,
dead-code expiry, residual stages, inference round-trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.nn.vq import (VQTrainState, ema_update, expire_dead_codes,
                                 init_vq_state, kmeans, kmeans_init,
                                 quantize, dequantize,
                                 residual_vq_train_step, to_checkpoint,
                                 vq_train_step)


def _clustered_batch(key, n_per=64, centers=((0., 0.), (4., 4.), (-4., 3.),
                                             (3., -5.))):
    ks = jax.random.split(key, len(centers))
    pts = [jnp.asarray(c) + 0.15 * jax.random.normal(k, (n_per, 2))
           for c, k in zip(centers, ks)]
    return jnp.concatenate(pts)


def test_kmeans_finds_clusters():
    x = _clustered_batch(jax.random.PRNGKey(0))
    # 8 means over 4 tight clusters: sampled init (reference has no
    # kmeans++) can land two means in one cluster, extra capacity makes
    # coverage deterministic enough to assert
    means, bins = kmeans(jax.random.PRNGKey(1), x, 8, num_iters=20)
    for c in ((0., 0.), (4., 4.), (-4., 3.), (3., -5.)):
        d = jnp.min(jnp.linalg.norm(means - jnp.asarray(c), axis=1))
        assert float(d) < 0.2, (c, np.asarray(means))
    assert float(jnp.sum(bins)) == x.shape[0]


def test_kmeans_init_only_once():
    x = _clustered_batch(jax.random.PRNGKey(2))
    st = init_vq_state(jax.random.PRNGKey(3), 4, 2)
    st1 = kmeans_init(st, jax.random.PRNGKey(4), x)
    assert bool(st1.inited)
    st2 = kmeans_init(st1, jax.random.PRNGKey(5), x * 100.0)
    np.testing.assert_array_equal(np.asarray(st1.embed), np.asarray(st2.embed))


def test_ema_update_moves_codebook():
    x = _clustered_batch(jax.random.PRNGKey(6))
    st = init_vq_state(jax.random.PRNGKey(7), 4, 2)
    st = kmeans_init(st, jax.random.PRNGKey(8), x)
    target = jnp.asarray([10.0, 10.0])
    shifted = x + target
    for i in range(300):
        idx = quantize(st.embed, shifted)
        st = ema_update(st, shifted, idx, decay=0.9)
    # EMA alone cannot split codes (that is expiry's job): the surviving
    # active code(s) converge onto the shifted data's mass; unassigned
    # codes decay toward zero
    global_mean = jnp.mean(shifted, axis=0)
    d = float(jnp.min(jnp.linalg.norm(st.embed - global_mean, axis=1)))
    assert d < 2.0, np.asarray(st.embed)
    assert float(jnp.max(jnp.linalg.norm(st.embed, axis=1))) > 5.0


def test_expiry_replaces_dead_codes():
    st = VQTrainState(
        inited=jnp.asarray(True),
        cluster_size=jnp.asarray([100.0, 100.0, 0.001, 100.0]),
        embed=jnp.zeros((4, 2)),
        embed_avg=jnp.zeros((4, 2)),
    )
    batch = jnp.ones((16, 2)) * 7.0
    # reference normalizes usage to mean 1.0 per code (core_vq.py:174-176),
    # so threshold 0.5 expires only genuinely dead codes on this toy usage
    st2, n = expire_dead_codes(st, jax.random.PRNGKey(9), batch, threshold=0.5)
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(st2.embed[2]), [7.0, 7.0])
    np.testing.assert_allclose(np.asarray(st2.embed[0]), [0.0, 0.0])
    # threshold 0 disables
    st3, n3 = expire_dead_codes(st, jax.random.PRNGKey(9), batch, threshold=0.0)
    assert int(n3) == 0


def test_vq_train_step_end_to_end():
    x = _clustered_batch(jax.random.PRNGKey(10)).reshape(16, 16, 2)
    st = init_vq_state(jax.random.PRNGKey(11), 8, 2)
    key = jax.random.PRNGKey(12)
    for i in range(20):
        key, sub = jax.random.split(key)
        # moderate expiry threshold: dead codes (e.g. a cluster missed by
        # the sampled kmeans init) get resampled from the batch and then
        # EMA-refined — that recovery is exactly what expiry is for
        q, idx, loss, st, n_exp = vq_train_step(
            st, sub, x, threshold_ema_dead_code=0.2)
    assert q.shape == x.shape and idx.shape == x.shape[:-1]
    assert float(loss) >= 0.0
    # reconstruction error should be small once codes settle on the clusters
    err = float(jnp.mean(jnp.linalg.norm(dequantize(st.embed, idx) - x, axis=-1)))
    assert err < 0.5

    # gradient flows through the straight-through estimator
    def f(xx):
        qq, _, commit, _, _ = vq_train_step(st, key, xx,
                                            threshold_ema_dead_code=0.0)
        return jnp.sum(qq ** 2) + commit

    g = jax.grad(f)(x)
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_residual_vq_and_checkpoint_roundtrip():
    x = _clustered_batch(jax.random.PRNGKey(13)).reshape(-1, 2)
    states = [init_vq_state(jax.random.PRNGKey(20 + i), 8, 2) for i in range(3)]
    q, codes, loss, states = residual_vq_train_step(
        states, jax.random.PRNGKey(14), x, threshold_ema_dead_code=0.0)
    assert codes.shape == (x.shape[0], 3)
    # residual refinement: 2-stage error >= 3-stage error (on train batch)
    r1 = float(jnp.mean(jnp.linalg.norm(
        dequantize(states[0].embed, codes[:, 0]) - x, axis=-1)))
    r3 = float(jnp.mean(jnp.linalg.norm(np.asarray(q) - x, axis=-1)))
    assert r3 <= r1 + 1e-6

    ckpt = to_checkpoint(states[0])
    # inference table = embedding_sum / clamp(cluster_usage) (codec_decoder)
    table = np.asarray(ckpt["embedding_sum"]) / np.clip(
        np.asarray(ckpt["cluster_usage"])[:, None], 1e-5, None)
    assert table.shape == (8, 2) and np.isfinite(table).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
