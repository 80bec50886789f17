"""E2E smoke run: 12Hz tokenizer round trips over every input form
(reference examples/test_tokenizer_12hz.py).

Usage: python examples/test_tokenizer_12hz.py /path/to/speech_tokenizer [ref.wav]
"""

import base64
import sys

import numpy as np


def main(model_dir: str, wav_path: str | None = None):
    from qwen3_tts_tpu.inference.tts_tokenizer import Qwen3TTSTokenizer
    from qwen3_tts_tpu.utils.audio_io import read_wav, write_wav

    st = Qwen3TTSTokenizer.from_pretrained(model_dir)
    sr = st.get_input_sample_rate()
    if wav_path:
        wav, wsr = read_wav(wav_path)
    else:
        t = np.linspace(0, 2.0, 2 * sr, endpoint=False)
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        wsr = sr

    # (ndarray, sr)
    enc = st.encode([(wav, wsr)])
    print("codes:", enc.audio_codes[0].shape)
    dec = st.decode(enc)
    print("decoded:", dec.audio_values[0].shape)
    write_wav("out_roundtrip.wav", dec.audio_values[0], st.get_output_sample_rate())

    # path input
    write_wav("/tmp/_tok_in.wav", wav, wsr)
    enc2 = st.encode("/tmp/_tok_in.wav")
    assert enc2.audio_codes[0].shape == enc.audio_codes[0].shape

    # base64 input
    b64 = base64.b64encode(open("/tmp/_tok_in.wav", "rb").read()).decode()
    enc3 = st.encode(b64)
    assert enc3.audio_codes[0].shape == enc.audio_codes[0].shape

    # batch
    enc4 = st.encode([(wav, wsr), (wav[: sr], wsr)])
    assert len(enc4.audio_codes) == 2
    print("all input forms OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
