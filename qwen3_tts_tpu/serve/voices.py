"""Named voice registry for the serving tiers.

The reference preps voice-cloning material as a "prompt_dir"
(scripts/encode_reference_audio.py:60-117 writes ref_codec_tokens.npy +
ref_text.txt) and its runtime never consumes it; this repo serves
prompt_dirs end-to-end, but until now the API named a voice by its raw
filesystem path. A registry turns that into a product surface:

- ``VoiceRegistry(root)`` scans ``root`` once at daemon start — every
  subdirectory holding ``ref_codec_tokens.npy`` becomes a voice named
  after the subdirectory (exactly the layout repeated runs of
  tools/encode_reference_audio.py --output_dir <root>/<name> produce).
- ``resolve(name)`` maps a registered name to its prompt_dir; the
  daemon applies it to a request-level ``"voice"`` field on BOTH
  transports and both tiers (engine + batched), so clients never need
  to know server paths.
- ``GET /v1/audio/voices`` (serve/http.py) lists what's available.

Raw prompt_dir paths remain accepted where they always were (the
``prompt_dir`` field, and the OpenAI route's ``voice`` fallback) — the
registry adds names on top, it does not revoke the path surface.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional


def is_prompt_dir(path: str) -> bool:
    """A usable voice-cloning prompt_dir: a directory holding the codec
    tokens file tools/encode_reference_audio.py writes. Content errors
    (corrupt npy) surface later through engine._load_prompt's
    self-identifying ValueError."""
    return (os.path.isdir(path)
            and os.path.exists(os.path.join(path, "ref_codec_tokens.npy")))


class VoiceRegistry:
    """Immutable-after-construction map of voice name -> prompt_dir.

    Names are the subdirectory basenames under ``root`` (sorted,
    deterministic). "default" is reserved for the unconditioned model
    voice and is rejected as a registration name.
    """

    RESERVED = ("default", "")

    def __init__(self, root: Optional[str] = None):
        self._voices: Dict[str, str] = {}
        if root is not None:
            if not os.path.isdir(root):
                raise ValueError(f"voices root {root!r} is not a directory")
            for name in sorted(os.listdir(root)):
                path = os.path.join(root, name)
                if is_prompt_dir(path):
                    self.register(name, path)

    def register(self, name: str, prompt_dir: str) -> None:
        if not isinstance(name, str) or name in self.RESERVED:
            raise ValueError(f"invalid voice name {name!r}")
        if not is_prompt_dir(prompt_dir):
            raise ValueError(
                f"voice {name!r}: {prompt_dir!r} is not a prompt_dir "
                "(expected a directory with ref_codec_tokens.npy, as "
                "written by tools/encode_reference_audio.py)")
        self._voices[name] = prompt_dir

    def resolve(self, name: str) -> Optional[str]:
        """prompt_dir for a registered name, else None (callers decide
        whether to fall back to treating ``name`` as a raw path)."""
        return self._voices.get(name)

    def names(self) -> List[str]:
        """Registered voice names, sorted ("default" not included — it
        is the absence of a prompt, listed separately by the API)."""
        return sorted(self._voices)

    def __len__(self) -> int:
        return len(self._voices)
