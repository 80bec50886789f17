"""SFT training step for the 12Hz talker (CustomVoice-style finetune).

Mirrors reference finetuning/sft_12hz.py:70-121: dual-channel (text, codec)
embedding grid, speaker embedding injected at row 6, codebook-0 CE on the
talker head plus 15-head CE through the code predictor on codec frames.
(The reference feeds raw text_embedding rows without text_projection here;
that quirk is reproduced for checkpoint-compatible training.)

The step is a single jittable function; under a (data, model) mesh the
params carry TP shardings and the batch is sharded on data — XLA emits the
gradient psums.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import TalkerConfig
from ..nn.attention import make_prefill_mask
from ..nn.layers import embed, linear
from ..nn.rope import make_inv_freq, rope_cos_sin
from ..nn.transformer import stack_forward
from ..models.talker import predictor_spec, talker_spec

IGNORE = -100


class SFTBatch(NamedTuple):
    input_ids: jax.Array            # (B, T, 2) [text, codec] channels
    codec_ids: jax.Array            # (B, T, 16) all codebooks per frame
    text_embedding_mask: jax.Array  # (B, T, 1)
    codec_embedding_mask: jax.Array  # (B, T, 1)
    attention_mask: jax.Array       # (B, T)
    codec_0_labels: jax.Array       # (B, T) with IGNORE
    codec_mask: jax.Array           # (B, T) bool: codec frame positions
    speaker_embedding: jax.Array    # (B, H)


def _masked_ce(logits: jax.Array, labels: jax.Array, vocab: int) -> jax.Array:
    """Cross-entropy with -100 ignore semantics, mean over valid tokens."""
    valid = labels != IGNORE
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def sft_loss(params: dict, cfg: TalkerConfig, batch: SFTBatch,
             talker_stack_fn=None) -> jax.Array:
    spec = talker_spec(cfg)
    cp = cfg.code_predictor
    n_groups = cfg.num_code_groups

    text_ids = batch.input_ids[..., 0]
    codec_ids0 = batch.input_ids[..., 1]
    text_emb = embed(params["text_embedding"], text_ids)
    if cfg.text_hidden_size != cfg.hidden_size:
        # the reference feeds raw rows (valid only when dims match, as on the
        # released checkpoints); bridge through text_projection otherwise
        from ..nn.layers import resize_mlp
        text_emb = resize_mlp(text_emb, params["text_projection"])
    x = (text_emb * batch.text_embedding_mask
         + embed(params["codec_embedding"], codec_ids0) * batch.codec_embedding_mask)
    # speaker embedding at fixed slot 6 (reference sft_12hz.py:91)
    x = x.at[:, 6, :].set(batch.speaker_embedding)

    cp_tables = params["code_predictor"]["codec_embeddings"]  # (15, Vcp, H)
    for i in range(1, n_groups):
        x = x + (embed(cp_tables[i - 1], batch.codec_ids[..., i])
                 * batch.codec_mask[..., None])

    b, t, _ = x.shape
    inv = make_inv_freq(spec.head_dim, spec.rope_theta)
    am = batch.attention_mask[:, :t - 1]
    positions = jnp.maximum(jnp.cumsum(am, axis=-1) - 1, 0)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    mask = make_prefill_mask(am, t - 1, spec.sliding_window)
    if talker_stack_fn is None:
        h, _ = stack_forward(spec, params["layers"], x[:, :-1], cos, sin,
                             mask, None)
    else:
        # pipeline-parallel (or otherwise custom) stack: parallel/pipeline.py
        h = talker_stack_fn(params["layers"], x[:, :-1], cos, sin, mask)

    logits = linear(h, params["codec_head"])
    talker_loss = _masked_ce(logits, batch.codec_0_labels[:, 1:], cfg.vocab_size)

    # ---- sub-talker 15-head CE over codec frames ----------------------------
    # teacher-forced sequence: [talker_hidden, emb(c0), cp_emb[0](c1), ...]
    cpp = params["code_predictor"]
    frame_mask = batch.codec_mask[:, 1:]  # aligns with h (shifted by 1)
    frame_codes = batch.codec_ids[:, 1:]  # (B, T-1, 16) teacher codes

    seq = [h]  # (B, T-1, H) hidden as position 0
    seq.append(embed(params["codec_embedding"], frame_codes[..., 0]))
    for i in range(1, n_groups - 1):
        seq.append(embed(cp_tables[i - 1], frame_codes[..., i]))
    cp_in = jnp.stack(seq, axis=2)  # (B, T-1, 16, H)

    bt = b * (t - 1)
    cp_in = cp_in.reshape(bt, n_groups, cfg.hidden_size)
    cp_in = linear(cp_in, cpp["small_to_mtp"], cpp["small_to_mtp_b"])

    cps = predictor_spec(cp)
    pos = jnp.broadcast_to(jnp.arange(n_groups)[None], (bt, n_groups))
    cinv = make_inv_freq(cps.head_dim, cps.rope_theta)
    ccos, csin = rope_cos_sin(pos, cinv, cp_in.dtype)
    cmask = make_prefill_mask(jnp.ones((bt, n_groups), jnp.int32), n_groups,
                              cps.sliding_window)
    ch, _ = stack_forward(cps, cpp["layers"], cp_in, ccos, csin, cmask, None)

    # head i predicts codebook i+1 from position i+1 (reference :1235-1238)
    sub_losses = []
    fm = frame_mask.reshape(bt)
    for i in range(1, n_groups):
        lg = linear(ch[:, i], cpp["lm_heads"][i - 1])
        labels = jnp.where(fm, frame_codes[..., i].reshape(bt), IGNORE)
        sub_losses.append(_masked_ce(lg, labels, cp.vocab_size))
    sub_loss = jnp.sum(jnp.stack(sub_losses)) / (n_groups - 1)

    return talker_loss + sub_loss


def make_train_step(cfg: TalkerConfig, optimizer: optax.GradientTransformation):
    """Returns jittable (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, batch: SFTBatch):
        loss, grads = jax.value_and_grad(sft_loss)(params, cfg, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def default_optimizer(lr: float = 2e-5) -> optax.GradientTransformation:
    """AdamW + global-norm clip 1.0 (reference sft_12hz.py:60, 118-119)."""
    return optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(lr, weight_decay=0.01))
