from .talker import (TalkerState, code_predictor_generate, init_talker_params,
                     predictor_spec, talker_decode_step, talker_prefill, talker_spec)
from .generation import (AssembledPrompt, GenerateResult, assemble_prompts,
                         generate_frames, trim_codes)

__all__ = [
    "TalkerState", "code_predictor_generate", "init_talker_params",
    "predictor_spec", "talker_decode_step", "talker_prefill", "talker_spec",
    "AssembledPrompt", "GenerateResult", "assemble_prompts",
    "generate_frames", "trim_codes",
]
