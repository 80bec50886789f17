"""ctypes bindings for the native audio runtime (native/audio_runtime.cc).

Builds on first use if the shared library is missing (plain g++, ~1s);
falls back transparently to the numpy implementations in audio_io.py when no
compiler is available. Use `get_runtime()` and check for None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaudio_runtime.so")

_runtime = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


class AudioRuntime:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.qtts_wav_decode.restype = ctypes.c_long
        lib.qtts_wav_decode.argtypes = [u8p, ctypes.c_long, f32p, ctypes.c_long,
                                        i32p, i32p]
        lib.qtts_wav_encode_pcm16.restype = ctypes.c_long
        lib.qtts_wav_encode_pcm16.argtypes = [f32p, ctypes.c_long, ctypes.c_int,
                                              ctypes.c_int, u8p, ctypes.c_long]
        lib.qtts_resample.restype = ctypes.c_long
        lib.qtts_resample.argtypes = [f32p, ctypes.c_long, ctypes.c_int,
                                      ctypes.c_int, f32p, ctypes.c_long]
        lib.qtts_peak_normalize.restype = None
        lib.qtts_peak_normalize.argtypes = [f32p, ctypes.c_long, ctypes.c_float]

    @staticmethod
    def _u8(buf):
        return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    @staticmethod
    def _f32(buf):
        return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def wav_decode(self, data: bytes) -> tuple[np.ndarray, int]:
        raw = np.frombuffer(data, np.uint8)
        sr = ctypes.c_int(0)
        ch = ctypes.c_int(0)
        n = self._lib.qtts_wav_decode(self._u8(raw), len(raw), None, 0,
                                      ctypes.byref(sr), ctypes.byref(ch))
        if n < 0:
            raise ValueError("malformed WAV")
        out = np.empty((n * ch.value,), np.float32)
        got = self._lib.qtts_wav_decode(self._u8(raw), len(raw), self._f32(out),
                                        out.size, ctypes.byref(sr), ctypes.byref(ch))
        wav = out[: got * ch.value]
        if ch.value > 1:
            wav = wav.reshape(-1, ch.value)
        return wav, sr.value

    def wav_encode_pcm16(self, wav: np.ndarray, sr: int) -> bytes:
        x = np.ascontiguousarray(wav, np.float32)
        ch = 1 if x.ndim == 1 else x.shape[1]
        frames = x.shape[0]
        need = self._lib.qtts_wav_encode_pcm16(self._f32(x), frames, ch, sr, None, 0)
        out = np.empty((need,), np.uint8)
        n = self._lib.qtts_wav_encode_pcm16(self._f32(x), frames, ch, sr,
                                            self._u8(out), need)
        return out[:n].tobytes()

    def resample(self, x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
        xin = np.ascontiguousarray(x, np.float32)
        n_out = self._lib.qtts_resample(self._f32(xin), len(xin), sr_in, sr_out,
                                        None, 0)
        out = np.empty((n_out,), np.float32)
        got = self._lib.qtts_resample(self._f32(xin), len(xin), sr_in, sr_out,
                                      self._f32(out), n_out)
        return out[:got]

    def peak_normalize(self, x: np.ndarray, target_db: float = -6.0) -> np.ndarray:
        out = np.ascontiguousarray(x, np.float32).copy()
        self._lib.qtts_peak_normalize(self._f32(out), len(out), target_db)
        return out


def get_runtime() -> Optional[AudioRuntime]:
    global _runtime, _tried
    if _runtime is not None or _tried:
        return _runtime
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        _runtime = AudioRuntime(ctypes.CDLL(_LIB_PATH))
    except OSError:
        _runtime = None
    return _runtime
