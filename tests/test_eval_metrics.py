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


# ---------------------------------------------------------------------------
# BASELINE guardrail metrics (VERDICT r1 item 5): STOI, PESQ, WER, driver
# ---------------------------------------------------------------------------

def _speechlike(seed=0, n=48000, sr=24000):
    """Amplitude-modulated multi-tone with pauses: enough structure for
    STOI's silence removal + correlation to behave like speech."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))  # syllabic 3 Hz modulation
    x = np.zeros(n)
    for f in (180, 420, 950, 1700, 2600):
        x += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    x *= env
    x[:1200] = 0.0
    x[-1200:] = 0.0
    return (0.2 * x / np.max(np.abs(x))).astype(np.float32)


def test_stoi_bounds_and_ordering():
    from qwen3_tts_tpu.eval.stoi import stoi

    x = _speechlike()
    rng = np.random.RandomState(3)
    assert stoi(x, x, 24000) > 0.999
    slight = (x + 0.005 * rng.randn(len(x))).astype(np.float32)
    heavy = (x + 0.15 * rng.randn(len(x))).astype(np.float32)
    s_id, s_sl, s_hv = stoi(x, x, 24000), stoi(x, slight, 24000), stoi(x, heavy, 24000)
    assert s_id > s_sl > s_hv
    assert s_hv < 0.9


def test_stoi_too_short_raises():
    from qwen3_tts_tpu.eval.stoi import stoi

    x = _speechlike(n=2000)
    with pytest.raises(ValueError, match="too short"):
        stoi(x, x, 24000)


def test_pesq_approx_bounds_and_ordering():
    from qwen3_tts_tpu.eval.pesq import pesq_approx, pesq_score

    x = _speechlike(seed=1)
    rng = np.random.RandomState(5)
    for mode in ("wb", "nb"):
        clean = pesq_approx(x, x, 24000, mode)
        assert clean == 4.5  # identical signals: zero disturbance
        slight = pesq_approx(x, (x + 0.01 * rng.randn(len(x))).astype(np.float32),
                             24000, mode)
        heavy = pesq_approx(x, (x + 0.2 * rng.randn(len(x))).astype(np.float32),
                            24000, mode)
        assert clean > slight > heavy
        assert heavy >= 1.0
    r = pesq_score(x, x, 24000, "wb")
    assert r["mode"] == "wb" and isinstance(r["certified"], bool)
    with pytest.raises(ValueError, match="mode"):
        pesq_approx(x, x, 24000, "xb")


def test_wer_cases():
    from qwen3_tts_tpu.eval.wer import (mixed_error_rate, normalize_text,
                                        word_error_rate)

    assert word_error_rate("Hello, World!", "hello world") == 0.0
    assert word_error_rate("a b c d", "a x c d") == 0.25
    assert word_error_rate("a b c d", "a b c") == 0.25       # deletion
    assert word_error_rate("a b c", "a b c d") == pytest.approx(1 / 3)
    # char-level for zh
    assert word_error_rate("你好世界", "你好地界", "chinese") == 0.25
    assert normalize_text("你好 世界", "chinese") == list("你好世界")
    # MER: CJK chars + latin words in one alignment
    assert mixed_error_rate("hello 世界", "hello 世界") == 0.0
    assert mixed_error_rate("hello 世界", "hallo 世界") == pytest.approx(1 / 3)


def test_transcription_gate_with_stub_asr():
    from qwen3_tts_tpu.eval.wer import TranscriptionGate

    gate = TranscriptionGate(lambda wav, sr, lang: "hello world")
    r = gate.score(np.zeros(100, np.float32), 24000, "Hello, world!")
    assert r["wer"] == 0.0
    b = gate.score_batch([np.zeros(10)] * 2, 24000,
                         ["hello world", "hello there"], ["english"] * 2)
    assert b["wer"] == pytest.approx(0.25)  # 0.0 and 0.5 averaged


def test_run_baseline_eval_driver():
    from qwen3_tts_tpu.eval.baseline_eval import EvalPair, run_baseline_eval

    x = _speechlike(seed=2)
    pairs = [EvalPair(syn=x, sr=24000, text="hello world", language="english"),
             EvalPair(syn=x, sr=24000, text="你好 hello", language="zh-en",
                      mixed=True)]
    report = run_baseline_eval(
        pairs=pairs,
        asr=lambda wav, sr, lang: "hello world" if lang == "english" else "你好 hello",
        judge=lambda wav, sr, text, ins: {"aps": 80.0, "dsd": 75.0, "rp": 60.0},
        instructs=["speak warmly", "speak fast"])
    assert report.rows["wer_by_language"]["english"] == 0.0
    assert report.rows["mer_cross_lingual"]["overall"] == 0.0
    assert report.rows["instruct_tts_eval"] == {"aps": 80.0, "dsd": 75.0, "rp": 60.0}
    md = report.to_markdown()
    assert "wer_by_language" in md and "| Metric | Value |" in md


def test_run_baseline_gate_tiny_checkpoint(tmp_path_factory):
    """The weights-day gate script runs end-to-end against the tiny test
    checkpoint (r2 verdict missing #2): synthesis configs run or are skipped
    with reasons, and the report serializes to markdown + json."""
    import jax.numpy as jnp
    from _checkpoint import StubProcessor, build_checkpoint

    from qwen3_tts_tpu.eval.run_baseline import run_gate
    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel

    d = build_checkpoint(str(tmp_path_factory.mktemp("gate_cv")), "custom_voice")
    m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, load_processor=False)
    m.processor = StubProcessor()

    def fake_asr(wav, sr, language):
        return "the quick brown fox"

    report = run_gate(d, model=m, max_new_tokens=6, asr=fake_asr,
                      reference_parity=True, quant_ab=True)
    rows = report.rows
    assert rows["config1_custom_voice"]["status"] == "ok"
    assert rows["config1_custom_voice"]["n"] == 2
    assert "wer_by_language" in rows and "overall" in rows["wer_by_language"]
    # reference parity tries to load the torch reference from the checkpoint;
    # without the full reference deps it must degrade to a reasoned skip
    assert rows["reference_greedy_parity"]["status"] in ("ok", "skipped")
    # quantization A/B: one row per deployable quantization string, incl.
    # the -kernel configs the BENCH headlines ship (r4 verdict next-round
    # #4); on the tiny geometry the kernel gates fall back and the row says
    # so via kernels_engaged
    qab = rows["quantization_ab"]
    for variant in ("int8", "int8-kernel", "int8+int8kv",
                    "int8+int8kv-kernel", "int4", "int4-kernel",
                    "int4+int8kv-kernel"):
        assert qab[variant]["status"] == "ok", qab[variant]
        assert len(qab[variant]["greedy_divergence_step"]) == 2
        assert "budget" in qab[variant]
        assert "kernels_engaged" in qab[variant]
    assert "replace_invented_presets" in rows["weights_day_checklist"]
    md = report.to_markdown()
    assert "config1_custom_voice" in md
    json_str = report.to_json()
    assert "BASELINE.md" in json_str

    # base checkpoint: clone configs run with ref audio, recon row computes
    import numpy as np
    d2 = build_checkpoint(str(tmp_path_factory.mktemp("gate_b")), "base")
    m2 = Qwen3TTSModel.from_pretrained(d2, dtype=jnp.float32,
                                       load_processor=False)
    m2.processor = StubProcessor()
    t = np.arange(24000) / 24000.0
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    report2 = run_gate(d2, model=m2, max_new_tokens=6,
                      ref_audio=(ref, 24000), ref_text="reference words")
    rows2 = report2.rows
    assert rows2["config3_voice_clone_icl"]["status"] == "ok"
    assert rows2["config4_voice_clone_xvec"]["status"] == "ok"
    assert "config5_tokenizer_reconstruction" in rows2
