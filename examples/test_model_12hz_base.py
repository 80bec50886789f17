"""E2E smoke run: voice clone on a Base checkpoint — the full API matrix
(reference examples/test_model_12hz_base.py: single/batch x direct/prompt-
reuse x icl/x-vector).

Usage: python examples/test_model_12hz_base.py /path/to/base_checkpoint ref.wav "ref transcript"
"""

import sys
import time

import jax.numpy as jnp


def run_case(name, fn):
    t0 = time.perf_counter()
    wavs, sr = fn()
    dt = time.perf_counter() - t0
    audio_s = sum(len(w) for w in wavs) / sr
    print(f"[{name}] {len(wavs)} wav(s), {audio_s:.2f}s in {dt:.2f}s")
    return wavs, sr


def main(model_dir: str, ref_wav: str, ref_text: str):
    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel

    model = Qwen3TTSModel.from_pretrained(model_dir, dtype=jnp.bfloat16)
    text = "The cloned voice should sound like the reference speaker."

    # direct ICL
    run_case("icl-direct", lambda: model.generate_voice_clone(
        text, language="english", ref_audio=ref_wav, ref_text=ref_text))

    # prompt reuse (create once, generate many)
    prompt = model.create_voice_clone_prompt(ref_wav, ref_text=ref_text)
    run_case("icl-prompt-single", lambda: model.generate_voice_clone(
        text, language="english", voice_clone_prompt=prompt))
    run_case("icl-prompt-batch", lambda: model.generate_voice_clone(
        [text, "Second sentence in the same voice."], language="english",
        voice_clone_prompt=prompt))

    # x-vector only
    xprompt = model.create_voice_clone_prompt(ref_wav, x_vector_only_mode=True)
    run_case("xvector-single", lambda: model.generate_voice_clone(
        text, language="english", voice_clone_prompt=xprompt))
    run_case("xvector-batch", lambda: model.generate_voice_clone(
        [text, text], language=["english", "english"], voice_clone_prompt=xprompt))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
