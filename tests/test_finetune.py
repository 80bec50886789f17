"""Finetuning pipeline tests: grid layout parity with the reference collate,
a full train loop on the tiny checkpoint, and CustomVoice save/reload."""

import json
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _checkpoint import StubProcessor, build_checkpoint
from _reference import install_reference, tiny_talker_config_dict

install_reference()


def test_grid_matches_reference_collate(tmp_path):
    """build_grid must reproduce the reference TTSDataset.collate_fn layout."""
    import sys
    sys.path.insert(0, "/root/reference/finetuning")
    from qwen_tts.core.models.configuration_qwen3_tts import Qwen3TTSConfig

    from qwen3_tts_tpu.config import TTSConfig
    from qwen3_tts_tpu.finetune.dataset import build_grid

    cfg_d = tiny_talker_config_dict()
    ref_cfg = Qwen3TTSConfig(talker_config=cfg_d, tts_model_type="base",
                             tts_pad_token_id=100, tts_bos_token_id=101,
                             tts_eos_token_id=102)
    tpu_cfg = TTSConfig.from_dict({
        "talker_config": cfg_d, "tts_model_type": "base",
        "tts_pad_token_id": 100, "tts_bos_token_id": 101, "tts_eos_token_id": 102})

    # emulate the reference collate body directly
    from dataset import TTSDataset  # reference module

    ds = TTSDataset.__new__(TTSDataset)
    ds.config = ref_cfg
    ds.lag_num = -1
    rng = np.random.RandomState(0)
    text_ids = torch.tensor(rng.randint(3, 90, size=(1, 9)))
    codes = torch.tensor(rng.randint(0, 60, size=(6, 16)))
    batch = [{"text_ids": text_ids, "audio_codes": codes,
              "ref_mel": torch.zeros(1, 4, 16)}]
    ref = ds.collate_fn(batch)

    total = ref["input_ids"].shape[1]
    got = build_grid(tpu_cfg, text_ids[0].numpy(), codes.numpy(), total)

    np.testing.assert_array_equal(got["text_ch"], ref["input_ids"][0, :, 0].numpy())
    np.testing.assert_array_equal(got["codec_ch"], ref["input_ids"][0, :, 1].numpy())
    np.testing.assert_array_equal(got["codec_ids"], ref["codec_ids"][0].numpy())
    np.testing.assert_array_equal(got["labels"], ref["codec_0_labels"][0].numpy())
    np.testing.assert_array_equal(got["codec_mask"], ref["codec_mask"][0].numpy())
    np.testing.assert_array_equal(got["attn"], ref["attention_mask"][0].numpy())
    np.testing.assert_array_equal(got["text_mask"],
                                  ref["text_embedding_mask"][0, :, 0].numpy())
    np.testing.assert_array_equal(got["codec_emb_mask"],
                                  ref["codec_embedding_mask"][0, :, 0].numpy())


def test_sft_loop_and_save(tmp_path):
    """Full tiny SFT: prepare data -> train steps reduce loss -> save
    CustomVoice checkpoint -> reload and synthesize with the new speaker."""
    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel
    from qwen3_tts_tpu.finetune.dataset import SFTDataset, prepare_data
    from qwen3_tts_tpu.finetune.sft import default_optimizer, make_train_step
    from qwen3_tts_tpu.finetune.run_sft import save_custom_voice_checkpoint
    from qwen3_tts_tpu.models.speaker_encoder import speaker_encode
    from qwen3_tts_tpu.utils.audio_io import write_wav

    ckpt = build_checkpoint(str(tmp_path), "base")
    model = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32,
                                          load_processor=False)
    model.processor = StubProcessor()

    # prepare jsonl with real wavs
    rng = np.random.RandomState(0)
    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, (rng.randn(24000) * 0.1).astype(np.float32), 24000)
    raw = str(tmp_path / "raw.jsonl")
    with open(raw, "w") as f:
        for i in range(2):
            f.write(json.dumps({"audio": wav_path, "text": f"sample {i}",
                                "ref_audio": wav_path}) + "\n")
    prepped = str(tmp_path / "train.jsonl")
    n = prepare_data(model.speech_tokenizer, raw, prepped)
    assert n == 2

    dataset = SFTDataset.from_jsonl(prepped, model.processor, model.config)
    optimizer = default_optimizer(1e-3)
    params = model.talker_params
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model.config.talker, optimizer),
                   donate_argnums=(0, 1))

    losses = []
    spk_emb = None
    for epoch in range(3):
        for batch, ref_mels in dataset.batches(2, shuffle_seed=epoch):
            mel = jnp.asarray(ref_mels[0][None])
            spk = np.asarray(speaker_encode(model.speaker_params,
                                            model.config.speaker_encoder, mel))
            spk_b = np.repeat(spk, batch.input_ids.shape[0], axis=0)
            if spk_emb is None:
                spk_emb = spk[0]
            batch = batch._replace(speaker_embedding=spk_b)
            batch = jax.tree.map(jnp.asarray, batch)
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    out_dir = str(tmp_path / "cv_out")
    save_custom_voice_checkpoint(ckpt, out_dir, params, model.config,
                                 spk_emb, "newvoice", new_spk_id=900)
    m2 = Qwen3TTSModel.from_pretrained(out_dir, dtype=jnp.float32,
                                       load_processor=False)
    m2.processor = StubProcessor()
    assert "newvoice" in m2.get_supported_speakers()
    wavs, sr = m2.generate_custom_voice("hello", speaker="newvoice",
                                        language="english", max_new_tokens=6,
                                        seed=0)
    assert len(wavs) == 1 and sr == 24000


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
