"""Decompose the 12Hz vocoder's 300-frame serving chunk on hardware.

The vocoder is ~41% of the serving time budget at the r3 headline
(talker 5561 f/s + vocoder 642 audio-s/s -> 262.8 combined), so its
internal split decides the next optimization. Times, at b=32/f=300:

  - rvq+pre_conv+transformer+output_proj  (frame rate, cheap?)
  - + upsample stages (2x2 transconv + ConvNeXt)
  - + SEANet decoder                      (sample rate, conv-heavy)

Usage:  python examples/profile_vocoder.py [batch] [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from qwen3_tts_tpu.config import CodecDecoderConfig
from qwen3_tts_tpu.models import codec_decoder as cd
from qwen3_tts_tpu.models.codec_decoder import init_codec_decoder_params
from qwen3_tts_tpu.nn.attention import causal_mask
from qwen3_tts_tpu.nn.conv import causal_conv1d, causal_transconv1d
from qwen3_tts_tpu.nn.layers import linear
from qwen3_tts_tpu.nn.rope import make_inv_freq, rope_cos_sin
from qwen3_tts_tpu.nn.transformer import stack_forward


def build(cfg, params, upto: str):
    """codec_decode truncated after `upto` ('transformer'|'upsample'|'all')."""

    def fn(p, codes):
        spec = cd.decoder_transformer_spec(cfg)
        h = cd.rvq_decode(codes, p["quantizer"])
        h = causal_conv1d(h, p["pre_conv_w"], p["pre_conv_b"])
        tr = p["transformer"]
        x = linear(h, tr["input_proj"], tr["input_proj_b"])
        b, t, _ = x.shape
        pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        inv = make_inv_freq(spec.head_dim, spec.rope_theta)
        cos, sin = rope_cos_sin(pos, inv, x.dtype)
        mask = causal_mask(t, t, 0, spec.sliding_window)[None, None]
        x, _ = stack_forward(spec, tr["layers"], x, cos, sin, mask, None)
        h = linear(x, tr["output_proj"], tr["output_proj_b"])
        if upto == "transformer":
            return jnp.sum(h, axis=(1, 2))
        for stage, factor in zip(p["upsample"], cfg.upsampling_ratios):
            h = causal_transconv1d(h, stage["tconv_w"], stage["tconv_b"],
                                   stride=factor)
            h = cd.convnext_block(h, stage["convnext"])
        if upto == "upsample":
            return jnp.sum(h, axis=(1, 2))
        dec = p["decoder"]
        h = causal_conv1d(h, dec["conv_in_w"], dec["conv_in_b"])
        for bi, (blk, rate) in enumerate(zip(dec["blocks"], cfg.upsample_rates)):
            h = cd.snake_beta(h, blk["act_alpha"], blk["act_beta"])
            h = causal_transconv1d(h, blk["tconv_w"], blk["tconv_b"], stride=rate)
            for ru, dilation in zip(blk["units"], (1, 3, 9)):
                h = cd.residual_unit(h, ru, dilation)
            if upto == f"seanet{bi}":
                return jnp.sum(h, axis=(1, 2))
        return jnp.sum(h, axis=(1, 2))

    return jax.jit(fn)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cfg = CodecDecoderConfig()
    params = bench._params_like(init_codec_decoder_params, cfg,
                                dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (batch, cfg.num_quantizers, frames), 0, 2048)
    print(f"device={jax.devices()[0]} b={batch} f={frames}", flush=True)

    for upto in ("transformer", "upsample", "seanet0", "seanet1", "seanet2",
                 "all"):
        fn = build(cfg, params, upto)
        float(fn(params, codes)[0])  # compile+warm

        def once(i):
            t0 = time.perf_counter()
            _ = float(fn(params, (codes + i) % 2048)[0])
            return time.perf_counter() - t0

        dt = min(once(i) for i in (1, 2, 3))
        audio = frames * batch / 12.5
        print(f"  upto {upto:12s}: {dt*1e3:8.2f} ms  ({audio/dt:7.1f} audio_s/s)",
              flush=True)


if __name__ == "__main__":
    main()
