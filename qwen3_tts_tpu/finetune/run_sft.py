"""SFT runner: finetune the 12Hz talker and save a CustomVoice checkpoint.

Mirrors reference finetuning/sft_12hz.py end-to-end:
  - jsonl of {audio, text, audio_codes, ref_audio}
  - dual-track batches, speaker embedding from ECAPA at slot 6
  - AdamW 2e-5, clip 1.0, grad-accum via batch size
  - save: copy checkpoint dir, rewrite config to custom_voice with a new
    spk_id whose codec-embedding row IS the target speaker embedding, drop
    speaker_encoder weights (sft_12hz.py:126-158)

Usage:
  python -m qwen3_tts_tpu.finetune.run_sft --init_model_path DIR \
      --train_jsonl data.jsonl --output_model_path out [--speaker_name name]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.weights import save_safetensors, talker_to_state_dict


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--init_model_path", type=str, required=True)
    parser.add_argument("--output_model_path", type=str, default="output")
    parser.add_argument("--train_jsonl", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--num_epochs", type=int, default=3)
    parser.add_argument("--speaker_name", type=str, default="speaker_test")
    parser.add_argument("--new_spk_id", type=int, default=3000)
    parser.add_argument("--pipeline_stages", type=int, default=1,
                        help="GPipe pipeline-parallel stages over the talker "
                             "layer stack (devices split (data, pipe); "
                             "parallel/pipeline.py). 1 = no PP.")
    parser.add_argument("--microbatches", type=int, default=4,
                        help="GPipe microbatches per step when "
                             "--pipeline_stages > 1 (must divide batch_size)")
    args = parser.parse_args(argv)

    from ..inference.tts_model import Qwen3TTSModel
    from ..models.speaker_encoder import speaker_encode
    from .dataset import SFTDataset
    from .sft import default_optimizer, make_train_step

    model = Qwen3TTSModel.from_pretrained(args.init_model_path, dtype=jnp.float32)
    cfg = model.config
    with open(args.train_jsonl) as f:
        data = [json.loads(l) for l in f if l.strip()]
    dataset = SFTDataset(data, model.processor, cfg)

    params = model.talker_params
    optimizer = default_optimizer(args.lr)
    pp_mesh = None
    if args.pipeline_stages > 1:
        from jax.sharding import Mesh

        from ..parallel.pipeline import (make_train_step_pp,
                                         pipeline_param_specs)
        from ..parallel.sharding import shard_params

        stages = args.pipeline_stages
        devs = jax.devices()
        dp = len(devs) // stages
        if dp < 1:
            raise SystemExit(f"--pipeline_stages {stages} needs >= {stages} "
                             f"devices, have {len(devs)}")
        if args.batch_size % args.microbatches:
            raise SystemExit("--microbatches must divide --batch_size")
        # the data axis shards microbatch rows; cap it at the largest count
        # that divides them (small batches on many-device hosts)
        mb_rows = args.batch_size // args.microbatches
        while dp > 1 and mb_rows % dp:
            dp -= 1
        pp_mesh = Mesh(np.asarray(devs[: dp * stages]).reshape(dp, stages),
                       ("data", "pipe"))
        params = shard_params(params, pp_mesh, pipeline_param_specs(params))
        step_fn = jax.jit(make_train_step_pp(
            cfg.talker, optimizer, pp_mesh,
            num_microbatches=args.microbatches,
            data_axis="data" if dp > 1 else None), donate_argnums=(0, 1))
    else:
        step_fn = jax.jit(make_train_step(cfg.talker, optimizer),
                          donate_argnums=(0, 1))
    opt_state = optimizer.init(params)
    spk_fn = jax.jit(lambda p, m: speaker_encode(p, cfg.speaker_encoder, m))

    target_spk_embedding = None
    for epoch in range(args.num_epochs):
        for bi, (batch, ref_mels) in enumerate(
                dataset.batches(args.batch_size, shuffle_seed=epoch)):
            # speaker embeddings (stop-gradient, reference :82-91)
            t_max = max(m.shape[0] for m in ref_mels)
            mel_b = np.zeros((len(ref_mels), t_max, ref_mels[0].shape[1]), np.float32)
            for i, m in enumerate(ref_mels):
                mel_b[i, :m.shape[0]] = m
            spk = np.asarray(spk_fn(model.speaker_params, jnp.asarray(mel_b)))
            if target_spk_embedding is None:
                target_spk_embedding = spk[0]
            batch = batch._replace(speaker_embedding=spk)
            batch = jax.tree.map(jnp.asarray, batch)
            params, opt_state, loss = step_fn(params, opt_state, batch)
            print(f"epoch {epoch} step {bi} loss {float(loss):.4f}", flush=True)

    save_custom_voice_checkpoint(
        args.init_model_path, args.output_model_path, params, cfg,
        target_spk_embedding, args.speaker_name, args.new_spk_id)
    print(f"saved CustomVoice checkpoint to {args.output_model_path}")


def save_custom_voice_checkpoint(init_dir: str, out_dir: str, params, cfg,
                                 speaker_embedding: np.ndarray,
                                 speaker_name: str, new_spk_id: int) -> None:
    """Reference sft_12hz.py:126-158 save semantics."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(init_dir):
        src = os.path.join(init_dir, name)
        dst = os.path.join(out_dir, name)
        if name.endswith(".safetensors") or name == "model.safetensors.index.json":
            continue
        if os.path.isdir(src):
            if not os.path.isdir(dst):
                shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)

    # write the speaker embedding into the new codec-embedding row
    params = jax.tree.map(np.asarray, params)
    emb = params["codec_embedding"].copy()
    emb[new_spk_id] = speaker_embedding
    params["codec_embedding"] = emb

    sd = talker_to_state_dict(params, cfg.talker, prefix="talker.")
    save_safetensors(sd, os.path.join(out_dir, "model.safetensors"))

    cfg_path = os.path.join(out_dir, "config.json")
    with open(cfg_path) as f:
        cfg_json = json.load(f)
    cfg_json["tts_model_type"] = "custom_voice"
    tc = cfg_json.setdefault("talker_config", {})
    spk = dict(tc.get("spk_id") or {})
    spk[speaker_name.lower()] = new_spk_id
    tc["spk_id"] = spk
    dial = dict(tc.get("spk_is_dialect") or {})
    dial[speaker_name.lower()] = False
    tc["spk_is_dialect"] = dial
    with open(cfg_path, "w") as f:
        json.dump(cfg_json, f, ensure_ascii=False, indent=1)


if __name__ == "__main__":
    main()
