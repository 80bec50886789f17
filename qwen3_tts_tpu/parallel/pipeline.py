"""GPipe-style pipeline parallelism for the talker decoder stack.

The reference DECLARES a pipeline-parallel plan but never executes one — its
`pp_plan` (reference configuration_qwen3_tts.py:181-185) is metadata consumed
by no reference code path. Here PP is real and TPU-native: the stacked
(L, ...) layer weights are sharded on a `pipe` mesh axis with `shard_map`,
each stage scans its local L/K layers, and activations rotate between
ICI-adjacent stages with `lax.ppermute`. The schedule is GPipe: M microbatches
flow through K stages in M + K - 1 rotation steps. Because `ppermute`'s
transpose is the reverse permutation, a single `jax.value_and_grad` of the
pipelined loss IS the backward pipeline — no hand-written 1F1B schedule.

Composition: the microbatch (batch) axis may additionally be sharded on the
mesh's `data` axis (PP x DP); TP inside a stage would compose the same way
(the stage-local layer scan is ordinary GSPMD-annotated code) but is not
wired here — the production TP path is `parallel/sharding.py`.

Bubble accounting (why this is the right PP for SFT, not serving): the GPipe
bubble fraction is (K-1)/(M+K-1); at the dryrun's K=2, M=4 that is 20%, and
for production finetuning M is chosen >= 4K. Autoregressive DECODING has a
1-token critical path per frame, so PP would add a K-deep latency chain with
no throughput win over the TP x DP serving layout — which is why serving
stays TP x DP (NOTES r2; the reference never runs PP either).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map
    _CHECK_KW = "check_vma"
except ImportError:  # pre-0.8 jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = "check_rep"


def shard_map(f=None, **kw):
    # the manual-replication check can't see that the closing psum makes the
    # out_specs=P() output replicated; disable it under either keyword name
    kw[_CHECK_KW] = False
    return _shard_map(f, **kw)

from ..nn.transformer import DecoderSpec, _layer, _split_layer_weights


def pipeline_param_specs(params: dict, axis_name: str = "pipe"):
    """PartitionSpec pytree for a talker param tree under PP: every stacked
    per-layer leaf (leading L axis) in `layers` shards its L dim on the pipe
    axis; everything else (embeddings, head, final norm, code predictor) is
    replicated. Compose with `shard_params` to place the tree."""

    def rule_layers(x):
        return P(axis_name, *([None] * (x.ndim - 1)))

    specs = jax.tree.map(lambda x: P(), params)
    specs["layers"] = jax.tree.map(rule_layers, params["layers"])
    if "norm" in params["layers"]:
        specs["layers"]["norm"] = P()  # final norm applied outside the stages
    return specs


def pipeline_stack_forward(spec: DecoderSpec, layers: dict, x: jax.Array,
                           cos: jax.Array, sin: jax.Array, mask: jax.Array,
                           mesh: Mesh, *, num_microbatches: int,
                           axis_name: str = "pipe",
                           data_axis: str | None = None) -> jax.Array:
    """Cache-free decoder-stack forward, pipelined over `mesh`'s `axis_name`.

    layers: the talker's stacked `params["layers"]` dict (with or without the
    final "norm", which is applied here outside the pipelined region when
    `spec.final_norm`). x: (B, T, H); cos/sin: (B, T, D); mask: (B, 1, T, T).
    B must divide by num_microbatches (and by the data-axis size when
    `data_axis` is given — that axis shards the microbatch rows, PP x DP).

    Matches `stack_forward(spec, layers, x, cos, sin, mask, None)` exactly:
    the rotation only re-orders WHEN each (microbatch, layer-slice) pair runs.
    """
    num_stages = mesh.shape[axis_name]
    m = num_microbatches
    b, t, h = x.shape
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    if spec.num_layers % num_stages:
        raise ValueError(f"{spec.num_layers} layers not divisible by "
                         f"{num_stages} pipeline stages")
    layer_ws = _split_layer_weights(layers)

    def mb_split(a):  # (B, ...) -> (M, B/M, ...)
        return a.reshape((m, b // m) + a.shape[1:])

    xs, coss, sins, masks = map(mb_split, (x, cos, sin, mask))

    dp = (data_axis,) if data_axis else ()
    mb_spec = lambda nd: P(None, *dp, *([None] * (nd - 1 - len(dp))))
    in_specs = (
        jax.tree.map(lambda a: P(axis_name, *([None] * (a.ndim - 1))),
                     layer_ws),
        mb_spec(xs.ndim), mb_spec(coss.ndim), mb_spec(sins.ndim),
        mb_spec(masks.ndim),
    )

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=mb_spec(xs.ndim))
    def run(lws, xs, coss, sins, masks):
        stage = jax.lax.axis_index(axis_name)
        is_last = stage == num_stages - 1

        def local_stack(hh, cos_m, sin_m, mask_m):
            def body(hh, lw):
                hh, _, _, _, _ = _layer(spec, lw, hh, cos_m, sin_m, mask_m,
                                        None, None, None)
                return hh, None
            hh, _ = jax.lax.scan(body, hh, lws)
            return hh

        def step(carry, s):
            recv, outbuf = carry
            mi = jnp.clip(s - stage, 0, m - 1)
            x_in = jax.lax.dynamic_index_in_dim(xs, mi, 0, keepdims=False)
            h_in = jnp.where(stage == 0, x_in, recv)
            out = local_stack(
                h_in,
                jax.lax.dynamic_index_in_dim(coss, mi, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(sins, mi, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(masks, mi, 0, keepdims=False))
            # only the last stage's in-schedule outputs land in the buffer;
            # other stages keep zeros so the closing psum replicates cleanly
            valid = (s >= stage) & (s - stage < m) & is_last
            cur = jax.lax.dynamic_index_in_dim(outbuf, mi, 0, keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(valid, out, cur), mi, 0)
            recv = jax.lax.ppermute(
                out, axis_name,
                [(i, (i + 1) % num_stages) for i in range(num_stages)])
            return (recv, outbuf), None

        outbuf0 = jnp.zeros(xs.shape, x.dtype)
        recv0 = jnp.zeros(xs.shape[1:], x.dtype)
        (_, outbuf), _ = jax.lax.scan(
            step, (recv0, outbuf0), jnp.arange(m + num_stages - 1))
        return jax.lax.psum(outbuf, axis_name)

    out = run(layer_ws, xs, coss, sins, masks).reshape(b, t, h)
    if spec.final_norm:
        from ..nn.layers import rms_norm
        out = rms_norm(out, layers["norm"], spec.rms_norm_eps)
    return out


def make_train_step_pp(cfg, optimizer, mesh: Mesh, *, num_microbatches: int,
                       axis_name: str = "pipe", data_axis: str | None = None):
    """SFT train step with the talker stack pipelined over `axis_name`
    (optionally PP x DP with the batch sharded on `data_axis`). Same
    semantics as `finetune.sft.make_train_step`; place params with
    `shard_params(params, mesh, pipeline_param_specs(params))` first."""
    import optax

    from ..finetune.sft import sft_loss
    from ..models.talker import talker_spec

    spec = talker_spec(cfg)

    def stack_fn(layers, x, cos, sin, mask):
        return pipeline_stack_forward(
            spec, layers, x, cos, sin, mask, mesh,
            num_microbatches=num_microbatches, axis_name=axis_name,
            data_axis=data_axis)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(sft_loss)(
            params, cfg, batch, talker_stack_fn=stack_fn)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
