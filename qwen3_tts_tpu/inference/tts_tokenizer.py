"""High-level 12Hz codec tokenizer API (encode / decode), mirroring the
reference Qwen3TTSTokenizer surface (reference qwen3_tts_tokenizer.py)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig
from ..models.codec_decoder import codec_decode
from ..models.codec_encoder import codec_encode
from ..utils.audio_io import AudioLike, normalize_audio_inputs
from ..utils.weights import (convert_codec_decoder, convert_codec_encoder,
                             load_safetensors_dir)


@dataclass
class EncoderOutput:
    audio_codes: List[np.ndarray]  # each (T_i, num_quantizers)


@dataclass
class DecoderOutput:
    audio_values: List[np.ndarray]  # each (T_wav_i,)


class Qwen3TTSTokenizer:
    """12Hz codec tokenizer: waveform <-> 16-codebook discrete codes."""

    def __init__(self, config: CodecConfig, encoder_params=None, decoder_params=None,
                 dtype=jnp.float32):
        self.config = config
        self.dtype = dtype
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        # opt-in: vocode through the per-DecoderBlock fused Pallas kernel
        # (ops/seanet_block.py); parity-tested, enabled when HW-measured
        # faster for the serving shape
        self.fused_seanet = False
        self._encode_jit = {}
        self._decode_jit = {}

    # -- loading -------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32):
        """Load from a local `speech_tokenizer/` checkpoint dir or a HF Hub
        model id. Dispatches on config model_type between the 12Hz (v2) and
        25Hz (v1) tokenizers (reference qwen3_tts_tokenizer.py:81-85
        registers both)."""
        import json

        from .tts_model import Qwen3TTSModel

        model_dir = Qwen3TTSModel._resolve_model_dir(model_dir)
        with open(os.path.join(model_dir, "config.json")) as f:
            model_type = json.load(f).get("model_type", "qwen3_tts_tokenizer_12hz")
        if "25hz" in model_type:
            from ..models.codec25.tokenizer_v1 import Qwen3TTSTokenizerV1

            return Qwen3TTSTokenizerV1.from_pretrained(model_dir, dtype=dtype)
        cfg = CodecConfig.from_json(os.path.join(model_dir, "config.json"))
        sd = load_safetensors_dir(model_dir)
        enc = convert_codec_encoder(sd, cfg.encoder, prefix="encoder.")
        dec = convert_codec_decoder(sd, cfg.decoder, prefix="decoder.")
        to_dev = lambda p: jax.tree.map(lambda x: jnp.asarray(x, dtype)
                                        if np.issubdtype(x.dtype, np.floating)
                                        else jnp.asarray(x), p)
        return cls(cfg, to_dev(enc), to_dev(dec), dtype)

    # -- encode --------------------------------------------------------------

    def encode(self, audios: Union[AudioLike, List[AudioLike]],
               sr: Optional[int] = None) -> EncoderOutput:
        """Audio(s) -> per-sample (T, num_quantizers) int codes
        (reference qwen3_tts_tokenizer.py:208-257)."""
        if isinstance(audios, np.ndarray) and sr is not None:
            audios = [(audios, sr)]
        elif isinstance(audios, list) and sr is not None:
            audios = [(a, sr) if isinstance(a, np.ndarray) else a for a in audios]
        items = normalize_audio_inputs(audios, target_sr=self.config.input_sample_rate)

        ds = self.config.encode_downsample_rate
        lengths = [len(w) for w, _ in items]
        t_max = max(lengths)
        # pad to a whole number of frames (bucketing keeps recompiles bounded)
        t_pad = ((t_max + ds - 1) // ds) * ds
        batch = np.zeros((len(items), t_pad), np.float32)
        for i, (w, _) in enumerate(items):
            batch[i, :len(w)] = w

        codes = np.asarray(self._encode(jnp.asarray(batch, self.dtype)))
        out = []
        for i, ln in enumerate(lengths):
            n_frames = -(-ln // ds)  # ceil
            out.append(codes[i, :, :n_frames].T.astype(np.int64))  # (T, K)
        return EncoderOutput(audio_codes=out)

    def _encode(self, wav: jax.Array) -> jax.Array:
        key = wav.shape
        if key not in self._encode_jit:
            nq = self.config.encoder_valid_num_quantizers
            self._encode_jit[key] = jax.jit(
                lambda p, w: codec_encode(p, self.config.encoder, w, nq))
        return self._encode_jit[key](self.encoder_params, wav)

    # -- decode --------------------------------------------------------------

    def decode(self, encoded) -> DecoderOutput:
        """Codes -> waveform(s). Accepts EncoderOutput, dict, list[dict] or a
        raw list of (T, K) arrays (reference qwen3_tts_tokenizer.py:259-365)."""
        codes_list = self._normalize_codes(encoded)
        k = self.config.decoder.num_quantizers
        lengths = [c.shape[0] for c in codes_list]
        t_max = max(lengths)
        batch = np.zeros((len(codes_list), k, t_max), np.int32)
        for i, c in enumerate(codes_list):
            batch[i, :, :c.shape[0]] = np.asarray(c).T

        wav = np.asarray(self._chunked_decode(jnp.asarray(batch)))
        up = self.config.decode_upsample_rate
        out = []
        for i in range(len(codes_list)):
            n_valid = int((batch[i, 0] > 0).sum()) * up
            out.append(wav[i, :n_valid].astype(np.float32))
        return DecoderOutput(audio_values=out)

    def _chunked_decode(self, codes: jax.Array, chunk_size: int = 300,
                        left_context_size: int = 25) -> jax.Array:
        """Reference chunked vocoding (modeling_..._v2.py:885-895) with a
        per-chunk-shape jit cache — full chunks share one compilation."""
        total_up = self.config.decoder.total_upsample
        t = codes.shape[-1]
        wavs = []
        start = 0
        while start < t:
            end = min(start + chunk_size, t)
            ctx = left_context_size if start - left_context_size > 0 else start
            chunk = codes[..., start - ctx:end]
            key = (chunk.shape, self.fused_seanet)
            if key not in self._decode_jit:
                self._decode_jit[key] = jax.jit(
                    lambda p, c, f=self.fused_seanet: codec_decode(
                        p, self.config.decoder, c, fused_seanet=f))
            wav = self._decode_jit[key](self.decoder_params, chunk)
            wavs.append(wav[..., ctx * total_up:])
            start = end
        return jnp.concatenate(wavs, axis=-1)

    @staticmethod
    def _normalize_codes(encoded) -> list:
        if isinstance(encoded, EncoderOutput):
            return list(encoded.audio_codes)
        if isinstance(encoded, dict):
            v = encoded["audio_codes"]
            return list(v) if isinstance(v, list) else [v]
        if isinstance(encoded, list):
            out = []
            for item in encoded:
                out.append(item["audio_codes"] if isinstance(item, dict) else item)
            return out
        if hasattr(encoded, "audio_codes"):
            v = encoded.audio_codes
            return list(v) if isinstance(v, list) else [v]
        raise TypeError(f"unsupported encoded type {type(encoded)}")

    # -- metadata ------------------------------------------------------------

    def get_model_type(self) -> str:
        return self.config.model_type

    def get_input_sample_rate(self) -> int:
        return self.config.input_sample_rate

    def get_output_sample_rate(self) -> int:
        return self.config.output_sample_rate

    def get_encode_downsample_rate(self) -> int:
        return self.config.encode_downsample_rate

    def get_decode_upsample_rate(self) -> int:
        return self.config.decode_upsample_rate
