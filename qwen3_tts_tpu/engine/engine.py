"""TTSEngine: the user-facing synthesis engine.

Replaces the reference's three socket servers + client orchestration
(components #1, #2, #5, #9 in SURVEY §2) with two jitted programs on one
chip:

  1. ``_generate``  — prefix build + talker prefill + the fused decode loop
                      (talker step + CP scan + feedback, engine/generate.py)
  2. ``_voc_chunk`` — fixed-shape FP32 vocoder chunk decode

plus host-side chunk orchestration with overlap-crossfade and WAV output.
Streaming mode dispatches vocoder chunks asynchronously (JAX async
dispatch) while the decode loop keeps running — the TPU analog of the
reference's background vocoder threads (tts_client.py:189-197).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import (
    SAMPLE_RATE,
    SAMPLES_PER_TOKEN,
    SUPPORTED_LANGUAGES,
    VOC_CHUNK_SIZE,
    VOC_OVERLAP,
    TTSConfig,
)
from qwen3_tts_tpu.engine import generate as gen
from qwen3_tts_tpu.io import wav as wav_io
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.io.tokenizer import load_tokenizer
from qwen3_tts_tpu.models import talker as tk
from qwen3_tts_tpu.models import vocoder as voc
from qwen3_tts_tpu.utils.profiling import StageTimer


@dataclasses.dataclass
class SynthesisResult:
    audio_int16: np.ndarray           # mono 24 kHz
    codes: np.ndarray                 # (n_tokens, 16)
    n_tokens: int
    timings: Dict[str, float]
    total_seconds: float
    rtf: float
    first_audio_seconds: Optional[float] = None

    @property
    def audio_seconds(self) -> float:
        return len(self.audio_int16) / SAMPLE_RATE


def _bucket(n: int, buckets=(16, 32, 64, 128, 256)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class TTSEngine:
    """Single-process TTS engine. ``model_dir=None`` runs with random
    weights (smoke/bench); pass an HF checkpoint dir for real synthesis."""

    def __init__(self, cfg: Optional[TTSConfig] = None,
                 model_dir: Optional[str] = None,
                 dtype=jnp.bfloat16, seed: int = 0,
                 params: Optional[Dict] = None):
        self.cfg = cfg or TTSConfig()
        self.params = params if params is not None else weights_io.load_params(
            model_dir, self.cfg, dtype, seed)
        self.tokenizer = load_tokenizer(model_dir)

        c = self.cfg

        def _generate_fn(tp, cpp, text_ids, n_text, key):
            prefix, plen = tk.build_prefix(tp, text_ids, n_text)
            prefix = prefix.astype(tp["codec_embedding"].dtype)
            return gen.generate(tp, cpp, prefix[None], plen[None],
                                n_text[None], key, c)

        # one compiled program per text-length bucket (cached by jit)
        self._generate = jax.jit(_generate_fn)

        def _voc_fn(vp, codes):
            return voc.decode(vp, codes, c.vocoder)

        self._voc_chunk = jax.jit(_voc_fn)

        # streaming: chunked decode-loop programs
        self._init_state = jax.jit(
            lambda tp, text_ids, n_text, key: self._mk_state(
                tp, text_ids, n_text, key))
        self._run_chunk = jax.jit(
            partial(gen.run_steps, cfg=c, max_steps=VOC_CHUNK_SIZE),
            static_argnames=())

    def _mk_state(self, tp, text_ids, n_text, key):
        prefix, plen = tk.build_prefix(tp, text_ids, n_text)
        prefix = prefix.astype(tp["codec_embedding"].dtype)
        return gen.init_state(tp, prefix[None], plen[None], n_text[None],
                              key, self.cfg)

    # ------------------------------------------------------------------
    def _encode_text(self, text: str):
        ids = self.tokenizer.encode(text, add_special_tokens=False)
        n = len(ids)
        b = _bucket(n)
        padded = np.zeros((b,), np.int32)
        padded[:n] = ids[:b]
        return jnp.asarray(padded), jnp.int32(min(n, b))

    def synthesize(self, text: str, language: str = "russian",
                   output: Optional[str] = None, streaming: bool = False,
                   seed: int = 0) -> SynthesisResult:
        """Full pipeline: text -> codes -> audio. Mirrors
        Qwen3TTSClient.synthesize (tts_client.py:110-271).

        ``language`` is validated against the supported set; as in the
        reference it does not alter prefix construction
        (llamacpp_talker_server.py:121 accepts-but-ignores it).
        """
        if language not in SUPPORTED_LANGUAGES:
            raise ValueError(
                f"unsupported language {language!r}; expected one of "
                f"{SUPPORTED_LANGUAGES}")

        timer = StageTimer()
        key = jax.random.PRNGKey(seed)
        tp = self.params["talker"]
        cpp = self.params["code_predictor"]
        vp = self.params["vocoder"]

        with timer.stage("tokenize"):
            text_ids, n_text = self._encode_text(text)

        first_audio_t: Optional[float] = None
        t_start = time.perf_counter()

        if not streaming:
            with timer.stage("decode"):
                codes_all, n_codes = self._generate(tp, cpp, text_ids,
                                                    n_text, key)
                n = int(jax.device_get(n_codes)[0])
                codes_np = np.asarray(jax.device_get(codes_all))[0][:n]
            with timer.stage("vocoder"):
                if n > 0:
                    audio = voc.synthesize_chunked(
                        lambda ch: self._voc_chunk(vp, jnp.asarray(ch)),
                        codes_np, VOC_CHUNK_SIZE, VOC_OVERLAP)
                    first_audio_t = time.perf_counter() - t_start
                else:
                    audio = np.zeros((0,), np.float32)
        else:
            # streaming: decode in 64-token chunks, dispatch vocoder chunks
            # asynchronously while the next decode chunk runs (disjoint
            # chunks, like the reference's streaming client path)
            with timer.stage("prefill"):
                state = self._init_state(tp, text_ids, n_text, key)
            pending: List[jax.Array] = []
            emitted = 0
            with timer.stage("decode+vocoder"):
                while True:
                    state = self._run_chunk(tp, cpp, state)
                    n_now = int(jax.device_get(state.n_codes)[0])
                    done = bool(jax.device_get(state.done)[0]) or (
                        int(jax.device_get(state.step)) >= self.cfg.max_tokens)
                    while n_now - emitted >= VOC_CHUNK_SIZE:
                        chunk = jax.lax.dynamic_slice_in_dim(
                            state.codes[0], emitted, VOC_CHUNK_SIZE, axis=0)
                        pending.append(self._voc_chunk(vp, chunk[None]))
                        emitted += VOC_CHUNK_SIZE
                        if first_audio_t is None:
                            first_audio_t = time.perf_counter() - t_start
                    if done:
                        break
                # tail chunk (padded)
                n = int(jax.device_get(state.n_codes)[0])
                codes_np = np.asarray(jax.device_get(state.codes))[0][:n]
                tail = n - emitted
                if tail > 0:
                    pad = np.zeros((1, VOC_CHUNK_SIZE, 16), np.int32)
                    pad[0, :tail] = codes_np[emitted:]
                    pending.append(self._voc_chunk(vp, jnp.asarray(pad)))
                chunks = []
                for i, fut in enumerate(pending):
                    a = np.asarray(jax.device_get(fut))[0]
                    is_tail = (i == len(pending) - 1) and tail > 0
                    keep = tail if is_tail else VOC_CHUNK_SIZE
                    chunks.append(a[:keep * SAMPLES_PER_TOKEN])
                    if first_audio_t is None:
                        first_audio_t = time.perf_counter() - t_start
                audio = (np.concatenate(chunks) if chunks
                         else np.zeros((0,), np.float32))

        audio_i16 = voc.to_int16(audio)
        total = timer.total()
        audio_dur = len(audio_i16) / SAMPLE_RATE
        result = SynthesisResult(
            audio_int16=audio_i16,
            codes=codes_np if n > 0 else np.zeros((0, 16), np.int32),
            n_tokens=n,
            timings=dict(timer.stages),
            total_seconds=total,
            rtf=(total / audio_dur) if audio_dur > 0 else float("inf"),
            first_audio_seconds=first_audio_t,
        )
        if output is not None and len(audio_i16) > 0:
            wav_io.write_wav(output, audio_i16)
        return result
