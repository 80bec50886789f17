"""SFT dataset: dual-channel (text, codec) id grids + masks.

Mirrors reference finetuning/dataset.py:146-218 exactly — prompt layout
[role(3) | nothink/think_bos/think_eos + SPK slot + codec_pad | tts_bos |
 text | tts_eos | codec_bos | codes | codec_eos] with the speaker-embedding
hole at absolute position 6 — produced as numpy batches for the jitted
train step. Batches are length-bucketed so XLA recompiles stay bounded.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Sequence

import numpy as np

from ..config import TTSConfig
from ..finetune.sft import SFTBatch
from ..ops.mel import mel_spectrogram
from ..utils.audio_io import load_audio

IGNORE = -100


def build_grid(cfg: TTSConfig, text_ids: np.ndarray, audio_codes: np.ndarray,
               total_len: int) -> dict:
    """One sample's id grid (reference collate_fn body). text_ids excludes the
    5-token template tail (dataset.py:139)."""
    t_cfg = cfg.talker
    tl = len(text_ids)
    cl = audio_codes.shape[0]
    n_groups = audio_codes.shape[1]
    t = total_len

    text_ch = np.zeros((t,), np.int64)
    codec_ch = np.zeros((t,), np.int64)
    codec_ids = np.zeros((t, n_groups), np.int64)
    text_mask = np.zeros((t,), bool)
    codec_emb_mask = np.zeros((t,), bool)
    codec_mask = np.zeros((t,), bool)
    attn = np.zeros((t,), np.int64)
    labels = np.full((t,), IGNORE, np.int64)

    text_ch[:3] = text_ids[:3]
    text_ch[3:7] = cfg.tts_pad_token_id
    text_ch[7] = cfg.tts_bos_token_id
    text_ch[8:8 + tl - 3] = text_ids[3:]
    text_ch[8 + tl - 3] = cfg.tts_eos_token_id
    text_ch[8 + tl - 2: 8 + tl + cl] = cfg.tts_pad_token_id
    text_mask[:8 + tl + cl] = True

    codec_ch[3:8] = [t_cfg.codec_nothink_id, t_cfg.codec_think_bos_id,
                     t_cfg.codec_think_eos_id, 0, t_cfg.codec_pad_id]
    codec_ch[8: 8 + tl - 3] = t_cfg.codec_pad_id
    codec_ch[8 + tl - 3] = t_cfg.codec_pad_id
    codec_ch[8 + tl - 2] = t_cfg.codec_bos_id
    codec_ch[8 + tl - 1: 8 + tl - 1 + cl] = audio_codes[:, 0]
    codec_ch[8 + tl - 1 + cl] = t_cfg.codec_eos_token_id

    labels[8 + tl - 1: 8 + tl - 1 + cl] = audio_codes[:, 0]
    labels[8 + tl - 1 + cl] = t_cfg.codec_eos_token_id

    codec_ids[8 + tl - 1: 8 + tl - 1 + cl] = audio_codes
    codec_emb_mask[3: 8 + tl + cl] = True
    codec_emb_mask[6] = False  # speaker-embedding slot
    codec_mask[8 + tl - 1: 8 + tl - 1 + cl] = True
    attn[:8 + tl + cl] = 1

    return dict(text_ch=text_ch, codec_ch=codec_ch, codec_ids=codec_ids,
                text_mask=text_mask, codec_emb_mask=codec_emb_mask,
                codec_mask=codec_mask, attn=attn, labels=labels)


class SFTDataset:
    """Loads the prepare_data jsonl ({audio, text, audio_codes, ref_audio})."""

    def __init__(self, data: Sequence[dict], processor, cfg: TTSConfig,
                 mel_dim: int | None = None):
        self.data = list(data)
        self.processor = processor
        self.cfg = cfg
        self.mel_dim = mel_dim or cfg.speaker_encoder.mel_dim

    @classmethod
    def from_jsonl(cls, path: str, processor, cfg: TTSConfig) -> "SFTDataset":
        with open(path) as f:
            return cls([json.loads(l) for l in f if l.strip()], processor, cfg)

    def __len__(self) -> int:
        return len(self.data)

    def _text_ids(self, text: str) -> np.ndarray:
        t = f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"
        ids = np.asarray(self.processor(t)["input_ids"], np.int64)
        return ids[:-5]

    def ref_mel(self, item: dict) -> np.ndarray:
        wav, sr = load_audio(item["ref_audio"], target_sr=24000)
        m = mel_spectrogram(wav[None], num_mels=self.mel_dim, sampling_rate=24000)
        return np.asarray(m).transpose(0, 2, 1)[0]  # (T, mel)

    def batches(self, batch_size: int, bucket: int = 64,
                shuffle_seed: int | None = 0) -> Iterator[tuple]:
        """Yields (SFTBatch-without-speaker, ref_mels list). The caller runs
        the speaker encoder and fills `speaker_embedding`."""
        order = np.arange(len(self.data))
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i:i + batch_size]
            items = [self.data[j] for j in idx]
            text_ids = [self._text_ids(it["text"]) for it in items]
            codes = [np.asarray(it["audio_codes"], np.int64) for it in items]
            raw_len = max(len(t) + c.shape[0] for t, c in zip(text_ids, codes)) + 8
            total = ((raw_len + bucket - 1) // bucket) * bucket

            grids = [build_grid(self.cfg, t, c, total)
                     for t, c in zip(text_ids, codes)]
            b = len(grids)
            n_groups = codes[0].shape[1]
            batch = SFTBatch(
                input_ids=np.stack([np.stack([g["text_ch"], g["codec_ch"]], -1)
                                    for g in grids]),
                codec_ids=np.stack([g["codec_ids"] for g in grids]),
                text_embedding_mask=np.stack(
                    [g["text_mask"] for g in grids])[..., None].astype(np.float32),
                codec_embedding_mask=np.stack(
                    [g["codec_emb_mask"] for g in grids])[..., None].astype(np.float32),
                attention_mask=np.stack([g["attn"] for g in grids]).astype(np.int32),
                codec_0_labels=np.stack([g["labels"] for g in grids]),
                codec_mask=np.stack([g["codec_mask"] for g in grids]),
                speaker_embedding=np.zeros((b, self.cfg.talker.hidden_size), np.float32),
            )
            yield batch, [self.ref_mel(it) for it in items]


def prepare_data(tokenizer, input_jsonl: str, output_jsonl: str,
                 batch_size: int = 32) -> int:
    """Batch-encode ref wavs -> audio_codes jsonl
    (reference finetuning/prepare_data.py)."""
    with open(input_jsonl) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    out = []
    for i in range(0, len(lines), batch_size):
        chunk = lines[i:i + batch_size]
        enc = tokenizer.encode([l["audio"] for l in chunk])
        for code, line in zip(enc.audio_codes, chunk):
            line["audio_codes"] = np.asarray(code).tolist()
            out.append(line)
    with open(output_jsonl, "w") as f:
        for line in out:
            f.write(json.dumps(line, ensure_ascii=False) + "\n")
    return len(out)
