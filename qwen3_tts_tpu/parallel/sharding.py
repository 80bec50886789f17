"""Name-based PartitionSpec rules for the talker/codec parameter pytrees.

Megatron-style tensor parallel over the "model" mesh axis, mirroring the
reference's declared HF TP plan (configuration_qwen3_tts.py:172-180):
column-parallel q/k/v + gate/up (+ per-codebook lm_heads), row-parallel
o_proj/down_proj; norms and embeddings replicated. The sampler state stays
per-sample (data axis), so decoding needs no cross-replica sync beyond the
psums GSPMD inserts inside each layer.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map_with_path, DictKey, SequenceKey

# rule table: (name suffix, rank) -> PartitionSpec builder
_COLWISE = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1")
_ROWWISE = ("o_proj", "down_proj", "fc2")
_COLWISE_2D = ("codec_head", "lm_heads")


def _leaf_name(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, DictKey):
            parts.append(str(p.key))
        elif isinstance(p, SequenceKey):
            parts.append(str(p.idx))
    return "/".join(parts)


def talker_param_specs(params, mesh_axes=("data", "model")):
    """PartitionSpec pytree for talker params. Stacked layer weights have a
    leading L axis, so the sharded dim shifts right by one."""
    model = mesh_axes[1]

    def rule(path, x):
        name = _leaf_name(path)
        last = name.rsplit("/", 1)[-1]
        nd = x.ndim
        if last in _COLWISE and nd == 3:      # (L, in, out) -> shard out
            return P(None, None, model)
        if last in _ROWWISE and nd == 3:      # (L, in, out) -> shard in
            return P(None, model, None)
        if last == "lm_heads" and nd == 3:    # (15, H_cp, V) -> shard V
            return P(None, None, model)
        if last == "codec_head" and nd == 2:  # (H, V) -> shard V (colwise_rep)
            return P(None, model)
        if last in ("q_bias", "k_bias", "v_bias") and nd == 2:
            return P(None, model)
        return P()  # replicate embeddings, norms, biases of rowwise, scalars

    return tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, specs=None):
    """Device-put a param pytree according to its specs over `mesh`."""
    if specs is None:
        specs = talker_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
