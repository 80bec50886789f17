from .tts_model import (Qwen3TTSModel, VoiceClonePromptItem,
                        load_voice_clone_prompt, save_voice_clone_prompt)
from .tts_tokenizer import Qwen3TTSTokenizer
from .streaming import (StreamingSession, stream_custom_voice,
                        stream_voice_clone, stream_voice_design)

__all__ = [
    "Qwen3TTSModel", "VoiceClonePromptItem", "Qwen3TTSTokenizer",
    "StreamingSession", "stream_custom_voice", "stream_voice_clone",
    "stream_voice_design", "save_voice_clone_prompt", "load_voice_clone_prompt",
]
