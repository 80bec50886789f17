"""Audio QA metrics sanity tests."""

import numpy as np
import pytest

from qwen3_tts_tpu.eval.metrics import (log_spectral_distance,
                                        mel_cepstral_distortion, segmental_snr,
                                        snr)


def _tone(f, n=24000, sr=24000, amp=0.3):
    return (amp * np.sin(2 * np.pi * f * np.arange(n) / sr)).astype(np.float32)


def test_identical_signals_are_perfect():
    x = _tone(220)
    assert mel_cepstral_distortion(x, x) < 1e-6
    assert log_spectral_distance(x, x) < 1e-6
    assert snr(x, x) > 100


def test_metrics_order_degradation():
    x = _tone(220)
    slight = (x + 0.01 * np.random.RandomState(0).randn(len(x))).astype(np.float32)
    heavy = (x + 0.2 * np.random.RandomState(1).randn(len(x))).astype(np.float32)
    assert snr(x, slight) > snr(x, heavy)
    assert mel_cepstral_distortion(x, slight) < mel_cepstral_distortion(x, heavy)
    assert log_spectral_distance(x, slight) < log_spectral_distance(x, heavy)
    assert segmental_snr(x, slight) > segmental_snr(x, heavy)


def test_different_content_scores_badly():
    a, b = _tone(220), _tone(880)
    assert mel_cepstral_distortion(a, b) > 1.0
    assert snr(a, b) < 5


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
