"""Weights-day gate: one command from a checkpoint dir to the BASELINE.md
quality table.

    python -m qwen3_tts_tpu.eval.run_baseline --checkpoint DIR \
        [--texts f.txt] [--asr-cmd 'CMD {wav} {lang}'] [--asr-transformers ID]
        [--ref-audio a.wav --ref-text "..."] [--reference-parity] [--out DIR]

Runs every BASELINE configuration the checkpoint supports (reference
README.md:465 protocol; BASELINE.md rows):

  1. custom-voice synthesis       (CustomVoice checkpoints)
  2. voice-design synthesis       (VoiceDesign checkpoints)
  3. voice-clone ICL              (Base checkpoints, needs --ref-audio/--ref-text)
  4. voice-clone x-vector-only    (Base checkpoints, needs --ref-audio)
  5. tokenizer reconstruction     (PESQ-WB/NB, STOI, SIM; README.md:1326-1335)

plus, with --reference-parity and torch + the reference package importable,
exact greedy codec-token parity against the torch reference on the same
checkpoint (the CI-proven oracle of tests/test_talker_parity.py, run at
checkpoint scale), and WER rows through the --asr hook. Rows whose inputs
are missing are reported as skipped with the reason — the gate never
silently narrows.

Wired for CI against the tiny test checkpoint (tests/test_eval_metrics.py);
on weights-day, point --checkpoint at the released dir and add the hooks.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from typing import List, Optional

import numpy as np

from .baseline_eval import (BaselineReport, EvalPair, synthesis_sim_rows,
                            synthesis_wer_rows, tokenizer_reconstruction_row)

DEFAULT_TEXTS = [
    ("The quick brown fox jumps over the lazy dog.", "english"),
    ("Speech synthesis quality is measured end to end.", "english"),
]


def _load_wav(path: str):
    from ..utils.audio_io import load_audio

    wav, sr = load_audio(path)
    return np.asarray(wav, np.float32), sr


def _make_asr(args):
    """ASR hook: (wav, sr, language) -> transcript, from --asr-cmd (shell
    template with {wav}/{lang} placeholders) or --asr-transformers."""
    if args.asr_cmd:
        from ..utils.audio_io import write_wav

        def asr(wav, sr, language):
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                path = f.name
            try:
                write_wav(path, wav, sr)
                cmd = args.asr_cmd.format(wav=path, lang=language)
                out = subprocess.run(cmd, shell=True, capture_output=True,
                                     text=True, timeout=600)
                return out.stdout.strip()
            finally:
                os.unlink(path)
        return asr
    if args.asr_transformers:
        from .wer import make_transformers_asr

        return make_transformers_asr(args.asr_transformers)
    return None


def _greedy_kwargs():
    return dict(do_sample=False, subtalker_dosample=False, top_k=1, top_p=1.0,
                temperature=1.0, subtalker_top_k=1, subtalker_top_p=1.0,
                subtalker_temperature=1.0)


def _reference_parity_row(checkpoint: str, texts, model, max_new_tokens: int):
    """Exact greedy codec-stream parity vs the torch reference loaded from
    the SAME checkpoint (reference modeling_qwen3_tts.py:1855-1938 load path,
    2272-2278 generate). Returns a result dict; never raises."""
    try:
        import torch  # noqa: F401
        from qwen_tts import Qwen3TTSModel as RefModel  # reference package
    except Exception as e:  # noqa: BLE001
        return {"status": "skipped", "reason": f"reference import failed: {e}"}
    try:
        ref = RefModel.from_pretrained(checkpoint, device_map="cpu",
                                       torch_dtype="float32")
        speaker = model.get_supported_speakers()[0] if model.get_supported_speakers() else None
        mismatches = []
        for text, lang in texts[:1]:
            ref_wavs, _ = ref.generate_custom_voice(
                text=text, speaker=speaker, language=lang,
                max_new_tokens=max_new_tokens, **_greedy_kwargs())
            our_wavs, _ = model.generate_custom_voice(
                text, speaker=speaker, language=lang,
                max_new_tokens=max_new_tokens, **_greedy_kwargs())
            a, b = np.asarray(ref_wavs[0]), np.asarray(our_wavs[0])
            n = min(len(a), len(b))
            if n == 0 or not np.allclose(a[:n], b[:n], atol=2e-2):
                mismatches.append(text)
        return {"status": "ok" if not mismatches else "MISMATCH",
                "mismatched_texts": mismatches}
    except Exception as e:  # noqa: BLE001
        return {"status": "skipped", "reason": f"reference run failed: {e}"}


def run_gate(checkpoint: str, texts=None, ref_audio=None, ref_text=None,
             asr=None, reference_parity: bool = False,
             max_new_tokens: int = 64, seed: int = 0,
             dtype="bfloat16", model=None) -> BaselineReport:
    """Programmatic entry. `model` overrides loading (CI passes the tiny
    checkpoint's model with a stub processor)."""
    import jax.numpy as jnp

    from ..inference.tts_model import Qwen3TTSModel

    texts = texts or DEFAULT_TEXTS
    if model is None:
        jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(dtype)]
        model = Qwen3TTSModel.from_pretrained(checkpoint, dtype=jdtype,
                                              load_processor=True)
    report = BaselineReport()
    mtype = model.config.tts_model_type
    report.add("checkpoint", {"dir": checkpoint, "tts_model_type": mtype,
                              "size": model.config.tts_model_size})
    pairs: List[EvalPair] = []

    def synth(name, fn, **kw):
        try:
            wavs, sr = fn(**kw)
            report.add(name, {"status": "ok", "n": len(wavs),
                              "audio_s": round(sum(len(w) for w in wavs) / sr, 2)})
            return wavs, sr
        except Exception as e:  # noqa: BLE001
            report.add(name, {"status": "skipped", "reason": str(e)})
            return None, None

    # --- configs 1-2: custom voice / voice design --------------------------
    if mtype == "custom_voice":
        spk = model.get_supported_speakers()[0] if model.get_supported_speakers() else None
        wavs, sr = synth("config1_custom_voice", model.generate_custom_voice,
                         text=[t for t, _ in texts], speaker=spk,
                         language=texts[0][1], max_new_tokens=max_new_tokens,
                         seed=seed)
        if wavs:
            pairs += [EvalPair(syn=w, sr=sr, text=t, language=lang)
                      for w, (t, lang) in zip(wavs, texts)]
    if mtype == "voice_design":
        wavs, sr = synth("config2_voice_design", model.generate_voice_design,
                         text=[t for t, _ in texts],
                         instruct="a calm clear voice",
                         language=texts[0][1], max_new_tokens=max_new_tokens,
                         seed=seed)
        if wavs:
            pairs += [EvalPair(syn=w, sr=sr, text=t, language=lang)
                      for w, (t, lang) in zip(wavs, texts)]

    # --- configs 3-4: voice clone (Base checkpoints) -----------------------
    if mtype == "base":
        if ref_audio is None:
            report.add("config3_voice_clone_icl",
                       {"status": "skipped", "reason": "--ref-audio not given"})
            report.add("config4_voice_clone_xvec",
                       {"status": "skipped", "reason": "--ref-audio not given"})
        else:
            rw, rsr = ref_audio
            if ref_text:
                items = model.create_voice_clone_prompt((rw, rsr),
                                                        ref_text=ref_text)
                wavs, sr = synth("config3_voice_clone_icl",
                                 model.generate_voice_clone,
                                 text=[t for t, _ in texts],
                                 voice_clone_prompt=items,
                                 language=texts[0][1],
                                 max_new_tokens=max_new_tokens, seed=seed)
            else:
                report.add("config3_voice_clone_icl",
                           {"status": "skipped", "reason": "--ref-text not given"})
                wavs = None
            xw, xsr = synth("config4_voice_clone_xvec",
                            model.generate_voice_clone,
                            text=[texts[0][0]], ref_audio=(rw, rsr),
                            x_vector_only_mode=True, language=texts[0][1],
                            max_new_tokens=max_new_tokens, seed=seed)
            for w_list, s in ((wavs, sr if wavs else None), (xw, xsr)):
                if w_list:
                    pairs += [EvalPair(syn=w, sr=s, text=t, language=lang,
                                       ref=rw, ref_sr=rsr)
                              for w, (t, lang) in zip(w_list, texts)]

    # --- config 5: tokenizer reconstruction --------------------------------
    try:
        recon_src = ([ref_audio[0]] if ref_audio is not None
                     else [w for w in ([p.syn for p in pairs[:1]]) if len(w)])
        recon_sr = ref_audio[1] if ref_audio is not None else (
            pairs[0].sr if pairs else 24000)
        if recon_src and len(recon_src[0]) >= 4800:
            row = tokenizer_reconstruction_row(
                model.speech_tokenizer, recon_src, recon_sr,
                base_model=model if getattr(model, "speaker_params", None)
                is not None else None)
            report.add("config5_tokenizer_reconstruction", row)
        else:
            report.add("config5_tokenizer_reconstruction",
                       {"status": "skipped",
                        "reason": "no audio >= 0.2 s available"})
    except Exception as e:  # noqa: BLE001
        report.add("config5_tokenizer_reconstruction",
                   {"status": "skipped", "reason": str(e)})

    # --- guardrail rows ------------------------------------------------------
    if asr is not None and pairs:
        report.add("wer_by_language", synthesis_wer_rows(pairs, asr))
    elif pairs:
        report.add("wer_by_language",
                   {"status": "skipped", "reason": "no ASR hook (--asr-cmd)"})
    if pairs and getattr(model, "speaker_params", None) is not None:
        try:
            sim = synthesis_sim_rows(pairs, model)
            report.add("speaker_sim_by_language",
                       sim or {"status": "skipped", "reason": "no ref audio"})
        except Exception as e:  # noqa: BLE001  (e.g. audio shorter than the
            report.add("speaker_sim_by_language",  # ECAPA receptive field)
                       {"status": "skipped", "reason": str(e)})

    if reference_parity:
        report.add("reference_greedy_parity",
                   _reference_parity_row(checkpoint, texts, model,
                                         max_new_tokens))
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--texts", help="file: one 'text<TAB>language' per line")
    ap.add_argument("--ref-audio", help="reference wav for voice-clone configs")
    ap.add_argument("--ref-text", help="transcript of --ref-audio (ICL mode)")
    ap.add_argument("--asr-cmd", help="shell ASR hook, e.g. 'asr {wav} {lang}'")
    ap.add_argument("--asr-transformers", help="HF ASR model id/dir")
    ap.add_argument("--reference-parity", action="store_true",
                    help="greedy parity vs the torch reference (needs torch)")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--out", help="write report.json/report.md here")
    args = ap.parse_args(argv)

    texts = None
    if args.texts:
        texts = []
        for line in open(args.texts, encoding="utf-8"):
            line = line.rstrip("\n")
            if not line:
                continue
            t, _, lang = line.partition("\t")
            texts.append((t, lang or "english"))
    ref_audio = _load_wav(args.ref_audio) if args.ref_audio else None

    report = run_gate(args.checkpoint, texts=texts, ref_audio=ref_audio,
                      ref_text=args.ref_text, asr=_make_asr(args),
                      reference_parity=args.reference_parity,
                      max_new_tokens=args.max_new_tokens, dtype=args.dtype)
    print(report.to_markdown())
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "report.json"), "w") as f:
            f.write(report.to_json())
        with open(os.path.join(args.out, "report.md"), "w") as f:
            f.write(report.to_markdown())
    return 0


if __name__ == "__main__":
    sys.exit(main())
