"""E2E smoke run: CustomVoice synthesis (reference examples/test_model_12hz_custom_voice.py).

Usage: python examples/test_model_12hz_custom_voice.py /path/to/checkpoint
"""

import sys
import time

import jax.numpy as jnp


def run_case(name, fn):
    t0 = time.perf_counter()
    wavs, sr = fn()
    dt = time.perf_counter() - t0
    audio_s = sum(len(w) for w in wavs) / sr
    print(f"[{name}] {len(wavs)} wav(s), {audio_s:.2f}s audio in {dt:.2f}s "
          f"(RTF {audio_s / dt:.2f})")
    return wavs, sr


def main(model_dir: str):
    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel
    from qwen3_tts_tpu.utils.audio_io import write_wav

    model = Qwen3TTSModel.from_pretrained(model_dir, dtype=jnp.bfloat16)
    speaker = model.get_supported_speakers()[0]

    wavs, sr = run_case("single", lambda: model.generate_custom_voice(
        "Hello! This is the TPU-native Qwen3 TTS framework.",
        speaker=speaker, language="english"))
    write_wav("out_single.wav", wavs[0], sr)

    run_case("batch", lambda: model.generate_custom_voice(
        ["First sentence.", "A somewhat longer second sentence to synthesize."],
        speaker=speaker, language="english"))

    run_case("instruct", lambda: model.generate_custom_voice(
        "Read this with excitement!", speaker=speaker, language="english",
        instruct="Speak with high energy and enthusiasm"))

    # streaming
    from qwen3_tts_tpu.inference.streaming import stream_custom_voice

    sess = stream_custom_voice(model, "Streaming synthesis test.",
                               speaker=speaker, language="english")
    chunks = list(sess)
    m = sess.metrics
    print(f"[streaming] {m.packets} packets, first packet {m.first_packet_s*1e3:.0f}ms, "
          f"RTF {m.rtf:.2f}")


if __name__ == "__main__":
    main(sys.argv[1])
