"""Quality evaluation: objective audio metrics + BASELINE.md guardrail gate."""

from .baseline_eval import (BaselineReport, EvalPair, run_baseline_eval,
                            tokenizer_reconstruction_row)
from .metrics import (codec_roundtrip_report, log_spectral_distance,
                      mel_cepstral_distortion, segmental_snr, snr,
                      speaker_similarity)
from .pesq import pesq_approx, pesq_score
from .stoi import stoi
from .wer import (TranscriptionGate, mixed_error_rate, normalize_text,
                  word_error_rate)

__all__ = [
    "BaselineReport", "EvalPair", "run_baseline_eval",
    "tokenizer_reconstruction_row", "codec_roundtrip_report",
    "log_spectral_distance", "mel_cepstral_distortion", "segmental_snr",
    "snr", "speaker_similarity", "pesq_approx", "pesq_score", "stoi",
    "TranscriptionGate", "mixed_error_rate", "normalize_text",
    "word_error_rate",
]
