"""E2E smoke run: VoiceDesign synthesis (reference examples/test_model_12hz_voice_design.py).

Usage: python examples/test_model_12hz_voice_design.py /path/to/checkpoint
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

    wavs, sr = run_case("single", lambda: model.generate_voice_design(
        "The quick brown fox jumps over the lazy dog.",
        instruct="A deep, calm male narrator voice with a slow pace",
        language="english"))
    write_wav("out_voice_design.wav", wavs[0], sr)

    run_case("batch", lambda: model.generate_voice_design(
        ["First sentence.", "A somewhat longer second sentence to synthesize."],
        instruct=["A bright cheerful young female voice",
                  "A gravelly old storyteller voice"],
        language="english"))

    run_case("non_streaming_layout", lambda: model.generate_voice_design(
        "Testing the non-streaming prompt layout.",
        instruct="A neutral newsreader voice", language="english",
        non_streaming_mode=True))

    # streaming
    from qwen3_tts_tpu.inference.streaming import stream_voice_design

    sess = stream_voice_design(model, "Streaming voice design test.",
                               instruct="An energetic sports commentator voice",
                               language="english")
    chunks = list(sess)
    m = sess.metrics
    print(f"[streaming] {m.packets} packets, first packet {m.first_packet_s*1e3:.0f}ms, "
          f"RTF {m.rtf:.2f}")


if __name__ == "__main__":
    main(sys.argv[1])
