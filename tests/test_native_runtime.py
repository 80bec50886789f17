"""Native C++ audio runtime vs the numpy/scipy reference implementations."""

import numpy as np
import pytest

from qwen3_tts_tpu.utils.audio_io import read_wav, resample, write_wav
from qwen3_tts_tpu.utils.native import get_runtime

rt = get_runtime()
pytestmark = pytest.mark.skipif(rt is None, reason="no C++ toolchain")


def test_wav_roundtrip_native(tmp_path):
    rng = np.random.RandomState(0)
    wav = (rng.randn(12345) * 0.3).clip(-1, 1).astype(np.float32)
    data = rt.wav_encode_pcm16(wav, 24000)
    assert data[:4] == b"RIFF"
    got, sr = rt.wav_decode(data)
    assert sr == 24000
    np.testing.assert_allclose(got, wav, atol=1.6 / 32768)  # PCM16 quant step

    # cross-check against the python wav writer/reader
    p = str(tmp_path / "x.wav")
    write_wav(p, wav, 24000)
    with open(p, "rb") as f:
        got2, sr2 = rt.wav_decode(f.read())
    ref2, _ = read_wav(p)
    np.testing.assert_allclose(got2, ref2, atol=1e-6)


def test_wav_decode_float32():
    # craft an IEEE float WAV and decode
    import struct

    wav = (np.sin(np.linspace(0, 30, 1000)) * 0.5).astype(np.float32)
    body = wav.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    got, sr = rt.wav_decode(data)
    assert sr == 16000
    np.testing.assert_allclose(got, wav, atol=1e-6)


def test_resample_matches_scipy():
    rng = np.random.RandomState(1)
    # band-limited signal (avoid aliasing-region disagreements)
    t = np.arange(24000) / 24000.0
    x = sum(np.sin(2 * np.pi * f * t) for f in (220, 880, 3000)).astype(np.float32)
    got = rt.resample(x, 24000, 16000)
    want = resample(x, 24000, 16000)
    assert abs(len(got) - len(want)) <= 1
    n = min(len(got), len(want))
    # interior comparison (edge transients differ by pad strategy)
    err = np.abs(got[100:n - 100] - want[100:n - 100])
    assert err.max() < 5e-3, err.max()


def test_peak_normalize():
    x = np.array([0.1, -0.25, 0.2], np.float32)
    y = rt.peak_normalize(x, -6.0)
    np.testing.assert_allclose(np.abs(y).max(), 10 ** (-6 / 20), atol=1e-6)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
