"""Demo CLI (reference qwen_tts/cli/demo.py parity).

Launches a Gradio app when gradio is installed; otherwise falls back to the
built-in HTTP server demo (`qwen3_tts_tpu.serving.server`) with the same
task routing. Flag surface mirrors the reference parser (demo.py:62-168):
device/dtype, ip/port/share, ssl, concurrency, sampling overrides.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("qwen3-tts-tpu-demo")
    p.add_argument("-c", "--checkpoint-path", type=str, required=True,
                   help="local checkpoint dir (reference layout)")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["bf16", "fp32"], help="model compute dtype")
    p.add_argument("--ip", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--share", action="store_true",
                   help="gradio share link (gradio backend only)")
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--ssl-certfile", type=str, default=None)
    p.add_argument("--ssl-keyfile", type=str, default=None)
    p.add_argument("--ssl-verify", action="store_true")
    # sampling overrides (None -> generation_config.json defaults)
    p.add_argument("--do-sample", type=lambda s: s.lower() == "true", default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--max-new-tokens", type=int, default=None)
    return p


def sampling_overrides(args) -> dict:
    keys = ["do_sample", "top_k", "top_p", "temperature", "repetition_penalty",
            "max_new_tokens"]
    return {k: getattr(args, k) for k in keys if getattr(args, k) is not None}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from ..inference.tts_model import Qwen3TTSModel

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = Qwen3TTSModel.from_pretrained(args.checkpoint_path, dtype=dtype)
    overrides = sampling_overrides(args)

    try:
        import gradio  # noqa: F401

        from .gradio_app import launch_gradio

        launch_gradio(model, args, overrides)
    except ImportError:
        print("gradio not installed — serving the built-in HTTP demo instead",
              file=sys.stderr)
        from ..serving.server import serve

        serve(model, host=args.ip, port=args.port, default_kwargs=overrides,
              ssl_certfile=args.ssl_certfile, ssl_keyfile=args.ssl_keyfile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
