"""Text processor (reference core/models/processing_qwen3_tts.py):
Qwen2 tokenizer wrapper with left padding and chat templating."""

from __future__ import annotations

from typing import List, Union

import numpy as np

CHAT_TEMPLATE = "{% for message in messages %}<|im_start|>{{ message.role }}\n{{ message.content }}<|im_end|>\n{% endfor %}{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"


class Qwen3TTSProcessor:
    """Wraps a HF tokenizer with the reference's left-padding convention
    (processing_qwen3_tts.py:19-25) and chat template (:91-94)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        if getattr(tokenizer, "padding_side", None) is not None:
            tokenizer.padding_side = "left"

    @classmethod
    def from_pretrained(cls, model_dir: str) -> "Qwen3TTSProcessor":
        from transformers import AutoTokenizer

        return cls(AutoTokenizer.from_pretrained(model_dir))

    def __call__(self, text: Union[str, List[str]], padding: bool = True):
        if isinstance(text, str):
            return {"input_ids": np.asarray(self.tokenizer(text)["input_ids"],
                                            np.int64)}
        enc = self.tokenizer(text, padding=padding)
        return {
            "input_ids": np.asarray(enc["input_ids"], np.int64),
            "attention_mask": np.asarray(enc["attention_mask"], np.int64),
        }

    def apply_chat_template(self, messages: List[dict],
                            add_generation_prompt: bool = True) -> str:
        parts = []
        for m in messages:
            parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        return "".join(parts)

    def decode(self, ids) -> str:
        return self.tokenizer.decode(ids)
