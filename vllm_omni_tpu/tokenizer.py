"""Tokenizer wrapper (host-side, optional).

Wraps a HF tokenizer when the model dir ships one; the engine itself works
purely on token ids (prompts can be pre-tokenized — reference:
OmniTokensPrompt inputs/data.py:40), so no tokenizer is required for
embedded / next-stage prompts.
"""

from __future__ import annotations

import os
from typing import Optional


def get_tokenizer(model_path: str, trust_remote_code: bool = False):
    """Returns a transformers tokenizer or None when unavailable."""
    if not os.path.isdir(model_path):
        return None
    has_tok = any(
        os.path.exists(os.path.join(model_path, f))
        for f in ("tokenizer.json", "tokenizer.model",
                  "tokenizer_config.json"))
    if not has_tok:
        return None
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        model_path, trust_remote_code=trust_remote_code)


class IncrementalDetokenizer:
    """Streams text deltas from a growing token-id list without
    re-decoding the full sequence (reference: engine/output_processor.py
    detokenization)."""

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer
        self._prefix_len = 0
        self._text = ""

    def update(self, token_ids: list[int]) -> str:
        """Feed the full output ids so far; returns the new text delta."""
        if self.tokenizer is None:
            return ""
        text = self.tokenizer.decode(token_ids, skip_special_tokens=True)
        # hold back text that may change when a multi-byte sequence
        # completes (utf-8 replacement char at the tail)
        if text.endswith("�"):
            return ""
        delta = text[len(self._text):]
        self._text = text
        return delta

    @property
    def text(self) -> str:
        return self._text
