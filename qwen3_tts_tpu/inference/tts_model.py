"""High-level TTS API: Qwen3TTSModel.

Mirrors the reference wrapper surface (reference qwen3_tts_model.py):
chat-template building, generation-kwargs merging, custom-voice /
voice-design / voice-clone entry points, voice-clone prompt creation, and
input polymorphism — re-hosted on the jitted TPU generation loop.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TTSConfig, load_generation_defaults
from ..models.generation import assemble_prompts, generate_frames, trim_codes
from ..models.speaker_encoder import convert_speaker_encoder, speaker_encode
from ..nn.sampling import SamplingConfig
from ..ops.mel import mel_spectrogram
from ..utils.audio_io import AudioLike, normalize_audio_inputs, resample
from ..utils.weights import convert_talker, load_safetensors_dir
from .tts_tokenizer import Qwen3TTSTokenizer

MaybeList = Union[Any, List[Any]]

HARD_DEFAULTS = dict(
    do_sample=True, top_k=50, top_p=1.0, temperature=0.9,
    repetition_penalty=1.05, subtalker_dosample=True, subtalker_top_k=50,
    subtalker_top_p=1.0, subtalker_temperature=0.9, max_new_tokens=2048,
)


@dataclass
class VoiceClonePromptItem:
    """Reusable voice-clone prompt (reference qwen3_tts_model.py:40-52).

    For 25Hz (v1) checkpoints the vocoder is a DiT+BigVGAN conditioned on a
    CAM++ x-vector and a reference mel, so the prompt additionally carries
    `x_vector` / `ref_mel` (the reference wrapper drops these and its 25Hz
    decode path is broken; here they ride the prompt item)."""

    ref_code: Optional[np.ndarray]          # (T, num_code_groups) / (T,) v1
    ref_spk_embedding: Optional[np.ndarray]  # (H,)
    x_vector_only_mode: bool = False
    icl_mode: bool = True
    ref_text: Optional[str] = None
    x_vector: Optional[np.ndarray] = None   # (192,) 25Hz only
    ref_mel: Optional[np.ndarray] = None    # (T_ref, 80) 25Hz only


def save_voice_clone_prompt(items: List[VoiceClonePromptItem], path: str) -> None:
    """Persist voice-clone prompt items for reuse. A `.npz` path (or no
    suffix) uses the torch-free native format; a `.pt` path writes the
    reference demo's exact payload — ``torch.save({"items": [asdict(it)]})``
    with tensor-valued arrays, loadable by the reference's
    ``torch.load(..., weights_only=True)`` (reference demo.py:501-551,
    535-582) — so sessions round-trip both ways."""
    import dataclasses

    if path.endswith(".pt"):
        import torch  # guarded: only the .pt interop path needs torch

        def conv(v):
            return torch.from_numpy(np.asarray(v)) if isinstance(
                v, (np.ndarray, list)) else v

        torch.save({"items": [
            {f.name: conv(getattr(it, f.name))
             for f in dataclasses.fields(VoiceClonePromptItem)}
            for it in items]}, path)
        return

    payload: Dict[str, Any] = {"n": np.asarray(len(items))}
    for i, it in enumerate(items):
        for f in dataclasses.fields(VoiceClonePromptItem):
            v = getattr(it, f.name)
            if v is None:
                continue
            if isinstance(v, (bool, str)):
                payload[f"{i}.{f.name}"] = np.asarray(v)
            else:
                payload[f"{i}.{f.name}"] = np.asarray(v)
    np.savez(path if path.endswith(".npz") else path + ".npz", **payload)


def load_voice_clone_prompt(path: str) -> List[VoiceClonePromptItem]:
    """Load `.npz` prompts saved above, or reference-format `.pt` payloads
    (torch pickles of prompt-item lists / dicts, demo.py:553-582)."""
    if path.endswith(".pt"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        items_raw = obj if isinstance(obj, list) else obj.get("items", [obj])
        out = []
        for it in items_raw:
            d = it if isinstance(it, dict) else it.__dict__
            to_np = lambda v: (v.detach().cpu().numpy()
                               if hasattr(v, "detach") else v)
            out.append(VoiceClonePromptItem(
                ref_code=to_np(d.get("ref_code")),
                ref_spk_embedding=to_np(d.get("ref_spk_embedding")),
                x_vector_only_mode=bool(d.get("x_vector_only_mode", False)),
                icl_mode=bool(d.get("icl_mode", True)),
                ref_text=d.get("ref_text"),
                x_vector=to_np(d.get("x_vector")),
                ref_mel=to_np(d.get("ref_mel"))))
        return out
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    n = int(data["n"])
    items = []
    for i in range(n):
        kw: Dict[str, Any] = {"ref_code": None, "ref_spk_embedding": None}
        for key in data.files:
            if not key.startswith(f"{i}."):
                continue
            name = key.split(".", 1)[1]
            v = data[key]
            if name in ("x_vector_only_mode", "icl_mode"):
                kw[name] = bool(v)
            elif name == "ref_text":
                kw[name] = str(v)
            else:
                kw[name] = v
        items.append(VoiceClonePromptItem(**kw))
    return items


class Qwen3TTSModel:
    """User-facing TTS model with custom-voice / voice-design / voice-clone."""

    def __init__(self, config: TTSConfig, talker_params, speaker_params=None,
                 speech_tokenizer: Qwen3TTSTokenizer | None = None,
                 processor=None, generate_defaults: Optional[Dict[str, Any]] = None,
                 dtype=jnp.float32):
        self.config = config
        self.talker_params = talker_params
        self.speaker_params = speaker_params
        self.speech_tokenizer = speech_tokenizer
        self.processor = processor
        self.generate_defaults = generate_defaults or {}
        self.dtype = dtype
        self.tts_model_type = config.tts_model_type
        self.tts_model_size = config.tts_model_size
        self.tokenizer_type = config.tokenizer_type
        self.speaker_encoder_sample_rate = config.speaker_encoder.sample_rate
        # opt-in KV-cache quantization for generation ("int8" -> jnp.int8);
        # the serving batcher takes its own kv_cache_dtype argument
        self.kv_cache_dtype = None
        self._gen_jit = {}

    # ------------------------------------------------------------------ load

    @staticmethod
    def _resolve_model_dir(model_id_or_dir: str) -> str:
        """Resolve a local directory or a HF Hub model id to a local snapshot
        dir (reference resolves hub ids inside AutoModel.from_pretrained and
        side-downloads speech_tokenizer/* via download_weights_from_hf_specific,
        modeling_qwen3_tts.py:55-92, 1855-1938). The snapshot includes the
        speech_tokenizer/ subfolder, so no separate side-download is needed."""
        if os.path.isdir(model_id_or_dir):
            return model_id_or_dir
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:  # pragma: no cover - hub is a transformers dep
            raise FileNotFoundError(
                f"{model_id_or_dir!r} is not a local directory and "
                "huggingface_hub is unavailable to resolve it as a model id"
            ) from e
        try:
            return snapshot_download(repo_id=model_id_or_dir)
        except Exception as e:
            raise FileNotFoundError(
                f"{model_id_or_dir!r} is not a local checkpoint directory and "
                f"could not be downloaded from the HuggingFace Hub ({e!r}). "
                "Pass a local dir, or check network access / the model id."
            ) from e

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.bfloat16,
                        load_processor: bool = True,
                        quantization: str | None = None,
                        fuse: bool = True) -> "Qwen3TTSModel":
        """Load a reference-format checkpoint: a local dir or a HF Hub model
        id resolving to config.json + safetensors + speech_tokenizer/ +
        generation_config.json (reference from_pretrained flow,
        modeling_qwen3_tts.py:1855-1938)."""
        import json

        model_dir = cls._resolve_model_dir(model_dir)
        with open(os.path.join(model_dir, "config.json")) as f:
            config = TTSConfig.from_dict(json.load(f))
        sd = load_safetensors_dir(model_dir)
        talker_params = convert_talker(sd, config.talker, prefix="talker.")
        talker_params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype) if np.issubdtype(x.dtype, np.floating)
            else jnp.asarray(x), talker_params)
        # fuse qkv + gate/up (semantics-preserving, fewer small matmuls);
        # pass fuse=False to keep the HF-exportable layout (finetuning)
        from ..models.talker import (fuse_talker_params, pack_talker_params,
                                     quantize_talker_params)

        if fuse:
            talker_params = jax.jit(fuse_talker_params)(talker_params)
        if quantization in ("int4", "int4-kernel"):
            # group-wise int4 talker (bf16 scales; cp stays int8): quarters
            # the decode talker weight read; quality budget gated by
            # eval/run_baseline --quant-ab. "int4-kernel" additionally packs
            # the sub-talker kernels and enables the fused int4 step kernel
            # (ops/talker_step_q4.py) for small-batch decode.
            from ..models.talker import quantize_talker_params_int4

            talker_params = jax.jit(quantize_talker_params_int4)(talker_params)
            if quantization == "int4-kernel":
                if not fuse:
                    raise ValueError("int4-kernel requires fuse=True")
                talker_params = pack_talker_params(talker_params)
        elif quantization in ("int8", "int8-kernel"):
            # weight-only int8: ~1.5x faster decode at b=1 on v5e
            talker_params = jax.jit(quantize_talker_params)(talker_params)
            if quantization == "int8-kernel":
                # also route the sub-talker through the fused Pallas
                # micro-step kernel (HW-validated: -18% cp-loop at b=32,
                # see examples/bench_subtalker_kernel.py). Requires fuse.
                if not fuse:
                    raise ValueError("int8-kernel requires fuse=True")
                talker_params = pack_talker_params(talker_params)
        elif quantization is not None:
            raise ValueError(f"unknown quantization {quantization!r}")

        speaker_params = None
        if config.tts_model_type == "base":
            speaker_params = convert_speaker_encoder(sd, config.speaker_encoder)
            speaker_params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                                          speaker_params)

        st_dir = os.path.join(model_dir, "speech_tokenizer")
        speech_tokenizer = (Qwen3TTSTokenizer.from_pretrained(st_dir, dtype=dtype)
                            if os.path.isdir(st_dir) else None)

        processor = None
        if load_processor:
            try:
                from transformers import AutoTokenizer

                processor = AutoTokenizer.from_pretrained(model_dir)
            except Exception:
                processor = None

        return cls(config, talker_params, speaker_params, speech_tokenizer,
                   processor, load_generation_defaults(model_dir), dtype)

    # ------------------------------------------------------------- utilities

    @staticmethod
    def _ensure_list(x: MaybeList) -> List[Any]:
        return x if isinstance(x, list) else [x]

    def _build_assistant_text(self, text: str) -> str:
        return f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"

    def _build_ref_text(self, text: str) -> str:
        return f"<|im_start|>assistant\n{text}<|im_end|>\n"

    def _build_instruct_text(self, instruct: str) -> str:
        return f"<|im_start|>user\n{instruct}<|im_end|>\n"

    def _tokenize_texts(self, texts: List[str]) -> List[np.ndarray]:
        if self.processor is None:
            raise RuntimeError("no text tokenizer loaded; pass input ids directly "
                               "or load with load_processor=True")
        return [np.asarray(self.processor(text)["input_ids"], np.int64)
                for text in texts]

    def _merge_generate_kwargs(self, **kwargs) -> Dict[str, Any]:
        merged = {}
        for name, default in HARD_DEFAULTS.items():
            v = kwargs.pop(name, None)
            if v is None:
                v = self.generate_defaults.get(name, default)
            merged[name] = v
        merged.update(kwargs)
        return merged

    def _supported_languages(self) -> List[str]:
        langs = ["auto"]
        for lang in self.config.talker.codec_language_id_map():
            if "dialect" not in lang:
                langs.append(lang)
        return langs

    def get_supported_languages(self) -> List[str]:
        return self._supported_languages()

    def get_supported_speakers(self) -> List[str]:
        return list(self.config.talker.spk_id_map().keys())

    def _validate_languages(self, languages: List[str]) -> None:
        sup = {l.lower() for l in self._supported_languages()}
        for lang in languages:
            if lang is not None and lang.lower() not in sup:
                raise ValueError(f"Unsupported language: {lang}. Supported: {sorted(sup)}")

    def _validate_speakers(self, speakers: List[Optional[str]]) -> None:
        sup = {s.lower() for s in self.get_supported_speakers()}
        for s in speakers:
            if s and s.lower() not in sup:
                raise ValueError(f"Unsupported speaker: {s}. Supported: {sorted(sup)}")

    # ------------------------------------------------------------ core infer

    def _generate_codes(self, input_ids, languages, speakers=None,
                        instruct_ids=None, ref_ids=None, voice_clone_prompt=None,
                        non_streaming_mode=False, **gen_kwargs) -> List[np.ndarray]:
        sampling = SamplingConfig(
            do_sample=bool(gen_kwargs["do_sample"]),
            top_k=int(gen_kwargs["top_k"]), top_p=float(gen_kwargs["top_p"]),
            temperature=float(gen_kwargs["temperature"]),
            repetition_penalty=float(gen_kwargs["repetition_penalty"]))
        sub_sampling = SamplingConfig(
            do_sample=bool(gen_kwargs["subtalker_dosample"]),
            top_k=int(gen_kwargs["subtalker_top_k"]),
            top_p=float(gen_kwargs["subtalker_top_p"]),
            temperature=float(gen_kwargs["subtalker_temperature"]),
            repetition_penalty=1.0)
        max_frames = int(gen_kwargs["max_new_tokens"]) - 1

        prompt = assemble_prompts(
            self.talker_params, self.config, input_ids, languages, speakers,
            instruct_ids, ref_ids, voice_clone_prompt, non_streaming_mode)

        seed = gen_kwargs.get("seed")
        key = jax.random.PRNGKey(np.random.randint(0, 2**31) if seed is None else seed)
        kv_dtype = ({"int8": jnp.int8}.get(self.kv_cache_dtype, self.kv_cache_dtype)
                    if isinstance(self.kv_cache_dtype, str) else self.kv_cache_dtype)
        result = generate_frames(
            self.talker_params, self.config.talker,
            prompt.inputs_embeds.astype(self.dtype), prompt.attention_mask,
            prompt.trailing_text_hidden.astype(self.dtype),
            prompt.tts_pad_embed.astype(self.dtype),
            key, max_frames, sampling, sub_sampling,
            kv_cache_dtype=kv_dtype)
        return trim_codes(result)

    @property
    def _is_v1_tokenizer(self) -> bool:
        t = (self.speech_tokenizer.get_model_type()
             if self.speech_tokenizer is not None else (self.tokenizer_type or ""))
        return "25hz" in (t or "")

    def _decode_wavs(self, codes_list: List[np.ndarray], vcp: Optional[dict] = None):
        sr = self.speech_tokenizer.get_output_sample_rate()
        if self._is_v1_tokenizer:
            # 25Hz DiT+BigVGAN decode needs (codes, x-vector, ref mel); decode
            # per sample — ref mels are ragged and clone batches are small.
            if vcp is None or vcp.get("x_vector") is None:
                raise ValueError(
                    "the 25Hz tokenizer decodes with x-vector + reference-mel "
                    "conditioning; use the voice-clone path (ref audio or a "
                    "VoiceClonePromptItem with x_vector/ref_mel set)")
            wavs = []
            for i, c in enumerate(codes_list):
                c = np.asarray(c)
                c1 = c[:, 0] if c.ndim == 2 else c  # single-codebook stream
                out = self.speech_tokenizer.decode(
                    [c1], [np.asarray(vcp["x_vector"][i])],
                    [np.asarray(vcp["ref_mel"][i])])
                wavs.append(out.audio_values[0])
            return wavs, sr
        out = self.speech_tokenizer.decode([{"audio_codes": c} for c in codes_list])
        return out.audio_values, sr

    # --------------------------------------------------------- custom voice

    def generate_custom_voice(self, text, speaker, language=None, instruct=None,
                              non_streaming_mode: bool = True,
                              **kwargs) -> Tuple[List[np.ndarray], int]:
        if self.tts_model_type != "custom_voice":
            raise ValueError(f"model type {self.tts_model_type} does not support "
                             "generate_custom_voice")
        texts = self._ensure_list(text)
        n = len(texts)
        languages = self._broadcast(language, n, default="auto")
        speakers = self._broadcast(speaker, n)
        if self.tts_model_size in ("0b6", "0.6b"):  # 0.6B drops instruct
            instruct = None
        instructs = self._broadcast(instruct, n, default="")
        self._validate_languages(languages)
        self._validate_speakers(speakers)

        input_ids = self._tokenize_texts([self._build_assistant_text(t) for t in texts])
        instruct_ids = [None if not ins else
                        self._tokenize_texts([self._build_instruct_text(ins)])[0]
                        for ins in instructs]

        gk = self._merge_generate_kwargs(**kwargs)
        codes = self._generate_codes(input_ids, languages, speakers, instruct_ids,
                                     non_streaming_mode=non_streaming_mode, **gk)
        return self._decode_wavs(codes)

    # --------------------------------------------------------- voice design

    def generate_voice_design(self, text, instruct, language=None,
                              non_streaming_mode: bool = True,
                              **kwargs) -> Tuple[List[np.ndarray], int]:
        if self.tts_model_type != "voice_design":
            raise ValueError(f"model type {self.tts_model_type} does not support "
                             "generate_voice_design")
        texts = self._ensure_list(text)
        n = len(texts)
        languages = self._broadcast(language, n, default="auto")
        instructs = self._broadcast(instruct, n)
        self._validate_languages(languages)

        input_ids = self._tokenize_texts([self._build_assistant_text(t) for t in texts])
        instruct_ids = [None if not ins else
                        self._tokenize_texts([self._build_instruct_text(ins)])[0]
                        for ins in instructs]

        gk = self._merge_generate_kwargs(**kwargs)
        codes = self._generate_codes(input_ids, languages, speakers=None,
                                     instruct_ids=instruct_ids,
                                     non_streaming_mode=non_streaming_mode, **gk)
        return self._decode_wavs(codes)

    # ---------------------------------------------------------- voice clone

    def extract_speaker_embedding(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """ECAPA embedding from 24kHz audio (reference modeling:1940-1954)."""
        assert sr == self.speaker_encoder_sample_rate, "Only 24kHz supported"
        mels = mel_spectrogram(jnp.asarray(audio[None], jnp.float32),
                               num_mels=self.config.speaker_encoder.mel_dim,
                               sampling_rate=sr)
        mels = jnp.transpose(mels, (0, 2, 1))  # (1, T, 128)
        emb = speaker_encode(self.speaker_params, self.config.speaker_encoder, mels)
        return np.asarray(emb[0])

    def create_voice_clone_prompt(self, ref_audio, ref_text=None,
                                  x_vector_only_mode=False) -> List[VoiceClonePromptItem]:
        if self.tts_model_type != "base":
            raise ValueError(f"model type {self.tts_model_type} does not support "
                             "create_voice_clone_prompt")
        audios = self._ensure_list(ref_audio)
        n = len(audios)
        ref_texts = ref_text if isinstance(ref_text, list) else [ref_text] * n
        xvecs = (x_vector_only_mode if isinstance(x_vector_only_mode, list)
                 else [x_vector_only_mode] * n)
        if len(ref_texts) != n or len(xvecs) != n:
            raise ValueError("Batch size mismatch in voice-clone prompt inputs")

        normalized = normalize_audio_inputs(audios)
        if self._is_v1_tokenizer:
            in_sr = self.speech_tokenizer.get_input_sample_rate()
            wavs_in = [resample(w, s, in_sr) for w, s in normalized]
            enc = self.speech_tokenizer.encode(wavs_in)
            xvectors, ref_mels = enc.xvectors, enc.ref_mels
        else:
            enc = self.speech_tokenizer.encode([(w, s) for w, s in normalized])
            xvectors = ref_mels = [None] * n

        items = []
        for i, ((wav, sr), code, rtext, xvec) in enumerate(
                zip(normalized, enc.audio_codes, ref_texts, xvecs)):
            if np.ndim(code) == 1:  # v1 single-codebook stream -> (T, 1)
                code = np.asarray(code).reshape(-1, 1)
            if not xvec and not rtext:
                raise ValueError(f"ref_text required in ICL mode (index {i})")
            wav24 = resample(wav, sr, self.speaker_encoder_sample_rate)
            spk = self.extract_speaker_embedding(wav24, self.speaker_encoder_sample_rate)
            items.append(VoiceClonePromptItem(
                ref_code=None if xvec else code,
                ref_spk_embedding=spk,
                x_vector_only_mode=bool(xvec), icl_mode=not xvec, ref_text=rtext,
                x_vector=xvectors[i], ref_mel=ref_mels[i]))
        return items

    @staticmethod
    def _prompt_items_to_dict(items: List[VoiceClonePromptItem]) -> Dict[str, Any]:
        d = {
            "ref_code": [it.ref_code for it in items],
            "ref_spk_embedding": [it.ref_spk_embedding for it in items],
            "x_vector_only_mode": [it.x_vector_only_mode for it in items],
            "icl_mode": [it.icl_mode for it in items],
        }
        if any(it.x_vector is not None for it in items):
            d["x_vector"] = [it.x_vector for it in items]
            d["ref_mel"] = [it.ref_mel for it in items]
        return d

    def generate_voice_clone(self, text, language=None, ref_audio=None,
                             ref_text=None, x_vector_only_mode=False,
                             voice_clone_prompt=None, non_streaming_mode=False,
                             **kwargs) -> Tuple[List[np.ndarray], int]:
        if self.tts_model_type != "base":
            raise ValueError(f"model type {self.tts_model_type} does not support "
                             "generate_voice_clone")
        texts = self._ensure_list(text)
        n = len(texts)
        languages = self._broadcast(language, n, default="auto")
        self._validate_languages(languages)

        if voice_clone_prompt is None:
            if ref_audio is None:
                raise ValueError("Either voice_clone_prompt or ref_audio is required")
            items = self.create_voice_clone_prompt(ref_audio, ref_text,
                                                   x_vector_only_mode)
            items = items * n if len(items) == 1 and n > 1 else items
            vcp = self._prompt_items_to_dict(items)
            ref_texts_for_ids = [it.ref_text for it in items]
        elif isinstance(voice_clone_prompt, list):
            items = voice_clone_prompt
            items = items * n if len(items) == 1 and n > 1 else items
            vcp = self._prompt_items_to_dict(items)
            ref_texts_for_ids = [it.ref_text for it in items]
        else:
            vcp = voice_clone_prompt
            ref_texts_for_ids = None

        input_ids = self._tokenize_texts([self._build_assistant_text(t) for t in texts])
        ref_ids = None
        if ref_texts_for_ids is not None:
            ref_ids = [None if not rt else
                       self._tokenize_texts([self._build_ref_text(rt)])[0]
                       for rt in ref_texts_for_ids]

        gk = self._merge_generate_kwargs(**kwargs)
        codes = self._generate_codes(input_ids, languages, ref_ids=ref_ids,
                                     voice_clone_prompt=vcp,
                                     non_streaming_mode=non_streaming_mode, **gk)

        # prepend ref codes for decode, then cut the ref portion proportionally
        # (reference qwen3_tts_model.py:612-632)
        ref_codes = vcp.get("ref_code")
        codes_for_decode = []
        for i, c in enumerate(codes):
            if ref_codes is not None and ref_codes[i] is not None:
                rc = np.asarray(ref_codes[i]).reshape(-1, c.shape[-1]) \
                    if np.ndim(ref_codes[i]) != np.ndim(c) else np.asarray(ref_codes[i])
                codes_for_decode.append(np.concatenate([rc, c], axis=0))
            else:
                codes_for_decode.append(c)
        wavs_all, fs = self._decode_wavs(codes_for_decode, vcp)

        wavs_out = []
        for i, wav in enumerate(wavs_all):
            if ref_codes is not None and ref_codes[i] is not None:
                ref_len = int(np.asarray(ref_codes[i]).shape[0])
                total = int(codes_for_decode[i].shape[0])
                cut = int(ref_len / max(total, 1) * wav.shape[0])
                wavs_out.append(wav[cut:])
            else:
                wavs_out.append(wav)
        return wavs_out, fs

    @staticmethod
    def _broadcast(x, n, default=None):
        if x is None:
            x = default
        items = x if isinstance(x, list) else [x]
        if len(items) == 1 and n > 1:
            items = items * n
        if len(items) != n:
            raise ValueError(f"Batch size mismatch: got {len(items)}, want {n}")
        return items
