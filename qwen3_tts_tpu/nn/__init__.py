from .attention import causal_mask, gqa_attention, make_prefill_mask
from .cache import KVCache, advance
from .layers import embed, layer_norm, linear, resize_mlp, rms_norm, swiglu_mlp
from .rope import apply_mrope, apply_rope, make_inv_freq, rope_cos_sin, rotate_half
from .sampling import (SamplingConfig, apply_top_k, apply_top_p, make_suppress_mask,
                       process_logits, sample_token)
from .transformer import DecoderSpec, cache_attention_mask, init_stack_params, stack_forward

__all__ = [
    "causal_mask", "gqa_attention", "make_prefill_mask",
    "KVCache", "advance",
    "embed", "layer_norm", "linear", "resize_mlp", "rms_norm", "swiglu_mlp",
    "apply_mrope", "apply_rope", "make_inv_freq", "rope_cos_sin", "rotate_half",
    "SamplingConfig", "apply_top_k", "apply_top_p", "make_suppress_mask",
    "process_logits", "sample_token",
    "DecoderSpec", "cache_attention_mask", "init_stack_params", "stack_forward",
]
