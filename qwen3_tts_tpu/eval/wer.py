"""Word/character/mixed error rate with a pluggable ASR hook.

BASELINE.md's model guardrails are WER tables (Seed-TTS test-zh/test-en,
multilingual, cross-lingual MER, long-speech — reference README.md:465,
547-765, 1164-1168). The reference computes them offline with external ASR
systems; this module provides the scoring half (language-aware
normalization + Levenshtein alignment) plus `TranscriptionGate`, which takes
any `asr(wav, sr, language) -> str` callable (e.g. a Whisper pipeline when
weights are available) and produces the WER rows of the BASELINE protocol.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np

# languages scored at character level (no whitespace word boundaries)
_CHAR_LEVEL = {"chinese", "zh", "japanese", "ja", "korean", "ko", "yue",
               "cantonese", "thai", "th"}

_PUNCT_RE = re.compile(
    r"[　-〿＀-￯!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~«»¡¿…·—–‘’“”]")


def normalize_text(text: str, language: str = "english") -> List[str]:
    """Lowercase, strip punctuation, NFKC-fold; tokenize to words (space
    languages) or characters (zh/ja/ko/th), mirroring common TTS-WER
    protocols (Whisper-normalizer style, simplified)."""
    t = unicodedata.normalize("NFKC", text).lower()
    t = _PUNCT_RE.sub(" ", t)
    t = re.sub(r"\s+", " ", t).strip()
    if language.lower() in _CHAR_LEVEL:
        return [c for c in t if not c.isspace()]
    return t.split()


def _levenshtein(ref: Sequence[str], hyp: Sequence[str]) -> int:
    """Edit distance (substitution/insertion/deletion all cost 1)."""
    if not ref:
        return len(hyp)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (r != h))
        prev = cur
    return prev[-1]


def word_error_rate(ref_text: str, hyp_text: str,
                    language: str = "english") -> float:
    """WER (or CER for character-level languages) in [0, inf)."""
    ref = normalize_text(ref_text, language)
    hyp = normalize_text(hyp_text, language)
    if not ref:
        return 0.0 if not hyp else float(len(hyp))
    return _levenshtein(ref, hyp) / len(ref)


def mixed_error_rate(ref_text: str, hyp_text: str) -> float:
    """MER for code-switched text (BASELINE cross-lingual rows): CJK scored
    per character, everything else per word, in one alignment."""
    def mixed_tokens(text):
        toks: List[str] = []
        for w in normalize_text(text, "english"):
            buf = ""
            for c in w:
                if "一" <= c <= "鿿" or "぀" <= c <= "ヿ":
                    if buf:
                        toks.append(buf)
                        buf = ""
                    toks.append(c)
                else:
                    buf += c
            if buf:
                toks.append(buf)
        return toks

    ref = mixed_tokens(ref_text)
    hyp = mixed_tokens(hyp_text)
    if not ref:
        return 0.0 if not hyp else float(len(hyp))
    return _levenshtein(ref, hyp) / len(ref)


@dataclass
class TranscriptionGate:
    """WER quality gate over synthesized audio.

    asr: callable (wav: np.ndarray, sr: int, language: str) -> str.
    Plug in any ASR (e.g. `transformers` Whisper pipeline) the day weights
    exist; scoring needs nothing beyond numpy.
    """

    asr: Callable[[np.ndarray, int, str], str]

    def score(self, wav: np.ndarray, sr: int, ref_text: str,
              language: str = "english", mixed: bool = False) -> dict:
        hyp = self.asr(np.asarray(wav, np.float32), int(sr), language)
        err = (mixed_error_rate(ref_text, hyp) if mixed
               else word_error_rate(ref_text, hyp, language))
        return {"wer" if not mixed else "mer": round(float(err), 5),
                "hyp": hyp, "language": language}

    def score_batch(self, wavs: Sequence[np.ndarray], sr: int,
                    ref_texts: Sequence[str],
                    languages: Optional[Sequence[str]] = None,
                    mixed: bool = False) -> dict:
        languages = list(languages or ["english"] * len(wavs))
        rows = [self.score(w, sr, t, l, mixed)
                for w, t, l in zip(wavs, ref_texts, languages)]
        key = "mer" if mixed else "wer"
        return {key: round(float(np.mean([r[key] for r in rows])), 5),
                "per_utterance": rows}


def make_transformers_asr(model_id_or_dir: str, device: str = "cpu"):
    """Build an `asr` callable from a local HF ASR checkpoint (e.g. Whisper).
    Import-gated: raises a clear error when transformers/torch or the
    checkpoint are unavailable."""
    from transformers import pipeline  # noqa: deferred heavy import

    pipe = pipeline("automatic-speech-recognition", model=model_id_or_dir,
                    device=device)

    def asr(wav: np.ndarray, sr: int, language: str) -> str:
        out = pipe({"array": np.asarray(wav, np.float32), "sampling_rate": sr})
        return out["text"]

    return asr
