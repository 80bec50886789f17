"""Host-side audio IO without librosa/soundfile.

Covers the reference's input polymorphism (path / URL / base64 / ndarray —
reference qwen3_tts_model.py:188-264) using the stdlib `wave` module for
RIFF PCM and scipy's polyphase resampler for rate conversion.
"""

from __future__ import annotations

import base64
import binascii
import io
import math
import os
import wave
from typing import List, Tuple, Union

import numpy as np

AudioLike = Union[str, Tuple[np.ndarray, int]]


def _native():
    from .native import get_runtime

    return get_runtime()


def read_wav(path_or_bytes) -> tuple[np.ndarray, int]:
    """Read a RIFF WAV (PCM 8/16/24/32 or float32) -> (float32 mono-ish, sr).
    Uses the native C++ decoder when built, numpy otherwise."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        fobj = io.BytesIO(bytes(path_or_bytes))
    else:
        fobj = open(path_or_bytes, "rb")
    with fobj:
        data = fobj.read()
    return _decode_riff(data)


def _decode_riff(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    rt = _native()
    if rt is not None:
        try:
            return rt.wav_decode(data)
        except ValueError:
            pass
    # try the simple path first (PCM via wave module)
    try:
        with wave.open(io.BytesIO(data)) as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(n)
        if sw == 2:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif sw == 4:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        elif sw == 1:
            x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif sw == 3:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / (1 << 23)
        else:
            raise ValueError(f"unsupported sample width {sw}")
        if ch > 1:
            x = x.reshape(-1, ch)
        return x, sr
    except wave.Error:
        pass
    # IEEE float WAV: parse chunks manually
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data" and fmt is not None:
            audio_fmt = int.from_bytes(fmt[0:2], "little")
            ch = int.from_bytes(fmt[2:4], "little")
            sr = int.from_bytes(fmt[4:8], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if audio_fmt == 3 and bits == 32:
                x = np.frombuffer(body, "<f4").astype(np.float32)
            elif audio_fmt == 3 and bits == 64:
                x = np.frombuffer(body, "<f8").astype(np.float32)
            else:
                raise ValueError(f"unsupported wav format {audio_fmt}/{bits}")
            if ch > 1:
                x = x.reshape(-1, ch)
            return x, sr
        pos += 8 + size + (size & 1)
    raise ValueError("malformed WAV")


def write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    """Write float32 [-1, 1] mono (or (T, C)) as PCM16 WAV."""
    x = np.asarray(wav)
    ch = 1 if x.ndim == 1 else x.shape[1]
    pcm = np.clip(x, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def resample(x: np.ndarray, orig_sr: int, target_sr: int,
             use_native: bool = False) -> np.ndarray:
    """Polyphase resampling (scipy; or the C++ runtime with use_native) —
    replaces librosa.resample host-side."""
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    if use_native:
        rt = _native()
        if rt is not None:
            return rt.resample(np.asarray(x, np.float32), int(orig_sr), int(target_sr))
    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    return resample_poly(np.asarray(x, np.float32), target_sr // g,
                         orig_sr // g).astype(np.float32)


def is_probably_base64(s: str) -> bool:
    if len(s) < 32 or os.path.exists(s):
        return False
    try:
        head = base64.b64decode(s[: 4 * ((len(s) // 4) or 1)][:64], validate=True)
    except (binascii.Error, ValueError):
        return False
    return head[:4] == b"RIFF" or len(s) > 256


def is_url(s: str) -> bool:
    return s.startswith(("http://", "https://"))


def load_audio(x: AudioLike, target_sr: int | None = None) -> tuple[np.ndarray, int]:
    """Normalize any supported audio input to (float32 mono, sr)."""
    if isinstance(x, tuple):
        wav, sr = np.asarray(x[0], np.float32), int(x[1])
    elif isinstance(x, np.ndarray):
        raise ValueError("raw ndarray needs a sample rate: pass (array, sr)")
    elif isinstance(x, str):
        if is_url(x):
            import urllib.request

            with urllib.request.urlopen(x) as r:
                wav, sr = _decode_riff(r.read())
        elif os.path.exists(x):
            wav, sr = read_wav(x)
        elif is_probably_base64(x):
            wav, sr = _decode_riff(base64.b64decode(x))
        else:
            raise FileNotFoundError(f"audio input not found: {x[:80]}")
    else:
        raise TypeError(f"unsupported audio input type {type(x)}")
    if wav.ndim > 1:
        wav = wav.mean(axis=-1)
    if target_sr is not None and sr != target_sr:
        wav, sr = resample(wav, sr, target_sr), target_sr
    return wav.astype(np.float32), sr


def normalize_audio_inputs(audios, target_sr: int | None = None) -> List[tuple]:
    items = audios if isinstance(audios, list) else [audios]
    return [load_audio(a, target_sr) for a in items]
