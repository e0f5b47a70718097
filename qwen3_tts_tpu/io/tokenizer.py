"""Text tokenization.

The reference loads the HF AutoTokenizer for Qwen3-TTS
(llamacpp_talker_server.py:95-100, local_files_only). We do the same when
the tokenizer files are available; otherwise (offline/dev environments) a
deterministic byte-level fallback keeps the pipeline runnable — token ids
are raw UTF-8 bytes offset into the text vocab, which exercises identical
shapes/dataflow (the embedding table lookup doesn't care which ids).
"""

from __future__ import annotations

from typing import List, Optional


class ByteFallbackTokenizer:
    """Deterministic stand-in: UTF-8 bytes as token ids (0..255)."""

    name = "byte-fallback"

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        del add_special_tokens
        return list(text.encode("utf-8"))


def load_tokenizer(model_dir: Optional[str] = None):
    """Try the HF tokenizer (local files only, as the reference does);
    fall back to bytes."""
    if model_dir is not None:
        try:
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(
                model_dir, trust_remote_code=True, local_files_only=True)
        except Exception:
            pass
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(
            "Qwen/Qwen3-TTS-12Hz-0.6B-Base", trust_remote_code=True,
            local_files_only=True)
    except Exception:
        return ByteFallbackTokenizer()
