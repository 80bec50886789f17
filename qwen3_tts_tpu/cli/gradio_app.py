"""Gradio demo app (reference cli/demo.py:246-629 task routing).

Only imported when gradio is installed; the task tabs shown depend on the
checkpoint's tts_model_type, mirroring the reference's per-type UI.
"""

from __future__ import annotations

import numpy as np


def launch_gradio(model, args, overrides: dict):
    import gradio as gr

    sr_out = model.speech_tokenizer.get_output_sample_rate()

    def _custom_voice(text, speaker, language, instruct):
        wavs, sr = model.generate_custom_voice(
            text, speaker=speaker, language=language or "auto",
            instruct=instruct or None, **overrides)
        return sr, np.asarray(wavs[0])

    def _voice_design(text, instruct, language):
        wavs, sr = model.generate_voice_design(
            text, instruct=instruct, language=language or "auto", **overrides)
        return sr, np.asarray(wavs[0])

    def _voice_clone(text, ref_audio, ref_text, xvec_only, language):
        ref_sr, ref_wav = ref_audio
        wavs, sr = model.generate_voice_clone(
            text, language=language or "auto",
            ref_audio=(np.asarray(ref_wav, np.float32) / 32768.0
                       if ref_wav.dtype == np.int16 else ref_wav, ref_sr),
            ref_text=ref_text or None, x_vector_only_mode=bool(xvec_only),
            **overrides)
        return sr, np.asarray(wavs[0])

    with gr.Blocks(title="Qwen3-TTS (TPU)") as demo:
        gr.Markdown(f"## Qwen3-TTS TPU — {model.tts_model_size} "
                    f"{model.tts_model_type}")
        langs = model.get_supported_languages()
        if model.tts_model_type == "custom_voice":
            text = gr.Textbox(label="Text")
            speaker = gr.Dropdown(model.get_supported_speakers(), label="Speaker")
            language = gr.Dropdown(langs, value="auto", label="Language")
            instruct = gr.Textbox(label="Instruction (optional)")
            out = gr.Audio(label="Output")
            gr.Button("Synthesize").click(_custom_voice,
                                          [text, speaker, language, instruct], out)
        elif model.tts_model_type == "voice_design":
            text = gr.Textbox(label="Text")
            instruct = gr.Textbox(label="Voice description")
            language = gr.Dropdown(langs, value="auto", label="Language")
            out = gr.Audio(label="Output")
            gr.Button("Synthesize").click(_voice_design, [text, instruct, language], out)
        else:  # base: voice clone
            text = gr.Textbox(label="Text")
            ref_audio = gr.Audio(label="Reference audio", type="numpy")
            ref_text = gr.Textbox(label="Reference transcript (ICL mode)")
            xvec = gr.Checkbox(label="x-vector only")
            language = gr.Dropdown(langs, value="auto", label="Language")
            out = gr.Audio(label="Output")
            gr.Button("Clone").click(_voice_clone,
                                     [text, ref_audio, ref_text, xvec, language], out)

            # saved-voice reuse (reference demo.py:501-582 saves/loads prompts)
            from ..inference.tts_model import (load_voice_clone_prompt,
                                               save_voice_clone_prompt)

            voice_path = gr.Textbox(label="Voice prompt file (.npz / .pt)")
            status = gr.Textbox(label="Voice status", interactive=False)

            def _save_voice(ref_audio, ref_text, xvec_only, path):
                ref_sr, ref_wav = ref_audio
                items = model.create_voice_clone_prompt(
                    (np.asarray(ref_wav, np.float32) / 32768.0
                     if ref_wav.dtype == np.int16 else ref_wav, ref_sr),
                    ref_text=ref_text or None,
                    x_vector_only_mode=bool(xvec_only))
                save_voice_clone_prompt(items, path)
                return f"saved voice prompt -> {path}"

            def _clone_saved(text, path, language):
                items = load_voice_clone_prompt(path)
                wavs, sr = model.generate_voice_clone(
                    text, language=language or "auto",
                    voice_clone_prompt=items, **overrides)
                return sr, np.asarray(wavs[0])

            gr.Button("Save voice").click(
                _save_voice, [ref_audio, ref_text, xvec, voice_path], status)
            gr.Button("Clone from saved voice").click(
                _clone_saved, [text, voice_path, language], out)

    demo.queue(default_concurrency_limit=args.concurrency).launch(
        server_name=args.ip, server_port=args.port, share=args.share,
        ssl_certfile=args.ssl_certfile, ssl_keyfile=args.ssl_keyfile,
        ssl_verify=args.ssl_verify)
