"""Text tokenization.

The reference loads the HF AutoTokenizer for Qwen3-TTS
(llamacpp_talker_server.py:95-100, local_files_only). We do the same when
the tokenizer files are available; otherwise (offline/dev environments) a
deterministic byte-level fallback keeps the pipeline runnable — token ids
are raw UTF-8 bytes offset into the text vocab, which exercises identical
shapes/dataflow (the embedding table lookup doesn't care which ids).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional


class ByteFallbackTokenizer:
    """Deterministic stand-in: UTF-8 bytes as token ids (0..255)."""

    name = "byte-fallback"

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        del add_special_tokens
        return list(text.encode("utf-8"))


def load_tokenizer(model_dir: Optional[str] = None):
    """Load the HF tokenizer from ``model_dir`` (local files only, as the
    reference does — llamacpp_talker_server.py:95-100), else the cached
    Qwen3-TTS tokenizer. The byte fallback is a DEV MODE: it is used only
    when no tokenizer files exist anywhere (random-weight smoke/bench
    runs) or when forced with ``QWEN3_TTS_TOKENIZER=byte``, and falling
    back despite an explicit ``model_dir`` warns loudly — EOS pacing
    (expected_len = 3 x n_text_tokens) behaves differently under ~1
    token/char byte ids than under BPE."""
    if os.environ.get("QWEN3_TTS_TOKENIZER") == "byte":
        return ByteFallbackTokenizer()
    if model_dir is not None:
        try:
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(
                model_dir, trust_remote_code=True, local_files_only=True)
        except Exception as e:
            print(f"warning: no tokenizer loadable from {model_dir} ({e}); "
                  "trying the cached Qwen3-TTS tokenizer",
                  file=sys.stderr)
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(
            "Qwen/Qwen3-TTS-12Hz-0.6B-Base", trust_remote_code=True,
            local_files_only=True)
    except Exception:
        if model_dir is not None:
            print("warning: falling back to the BYTE tokenizer (dev mode) "
                  "— token counts and EOS pacing will not match the real "
                  "model's BPE", file=sys.stderr)
        return ByteFallbackTokenizer()
