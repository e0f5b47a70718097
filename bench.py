"""Benchmark: end-to-end synthesis RTF on one TPU chip (full 0.6B geometry,
random weights — the compute/memory profile is identical to real weights).

Prints ONE JSON line:
  {"metric": "rtf_e2e", "value": <RTF>, "unit": "x_realtime",
   "vs_baseline": <reference_RTF / ours>}

Baseline: the reference's end-to-end RTF 2.0x on CM3588 (BASELINE.md).
vs_baseline > 1 means we are that many times faster than the reference.
Detailed per-stage numbers go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    # persistent compile cache: the fused decode program is large and the
    # tunneled-TPU compile is slow; cache it across bench runs.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from qwen3_tts_tpu.config import (
        SAMPLE_RATE, SAMPLES_PER_TOKEN, VOC_CHUNK_SIZE, VOC_OVERLAP, TTSConfig,
    )
    from qwen3_tts_tpu.engine import generate as gen
    from qwen3_tts_tpu.io import weights as weights_io
    from qwen3_tts_tpu.models import talker as tk
    from qwen3_tts_tpu.models import vocoder as voc

    dev = jax.devices()[0]
    log(f"device: {dev} ({jax.default_backend()})")

    cfg = TTSConfig()
    dtype = jnp.bfloat16
    t0 = time.perf_counter()
    params = weights_io.init_random_params(cfg, seed=0, dtype=dtype)
    tp, cpp, vp = (params["talker"], params["code_predictor"],
                   params["vocoder"])
    jax.block_until_ready(tp)
    log(f"params init: {time.perf_counter() - t0:.1f}s")

    # fixed prompt: 30 text tokens (bucket 32)
    n_text_val = 30
    ids = np.zeros(32, np.int32)
    ids[:n_text_val] = np.arange(100, 100 + n_text_val)
    ids_j = jnp.asarray(ids)
    n_text = jnp.int32(n_text_val)

    @jax.jit
    def generate_fn(tp, cpp, ids, n_text, key):
        prefix, plen = tk.build_prefix(tp, ids, n_text)
        prefix = prefix.astype(tp["codec_embedding"].dtype)
        return gen.generate(tp, cpp, prefix[None], plen[None], n_text[None],
                            key, cfg)

    @jax.jit
    def voc_fn(vp, codes):
        return voc.decode(vp, codes, cfg.vocoder)

    # --- compile (warmup) ---
    t0 = time.perf_counter()
    codes, n_codes = generate_fn(tp, cpp, ids_j, n_text, jax.random.PRNGKey(0))
    jax.block_until_ready(codes)
    log(f"decode compile+first run: {time.perf_counter() - t0:.1f}s "
        f"(n_codes={int(n_codes[0])})")
    t0 = time.perf_counter()
    wav = voc_fn(vp, jnp.zeros((1, VOC_CHUNK_SIZE, 16), jnp.int32))
    jax.block_until_ready(wav)
    log(f"vocoder compile+first run: {time.perf_counter() - t0:.1f}s")

    # --- timed end-to-end runs ---
    rtfs, decode_ms_tok, voc_s_chunk, first_audio = [], [], [], []
    for trial in range(3):
        key = jax.random.PRNGKey(10 + trial)
        t_start = time.perf_counter()
        codes, n_codes = generate_fn(tp, cpp, ids_j, n_text, key)
        n = int(jax.device_get(n_codes)[0])
        t_decode = time.perf_counter() - t_start
        codes_np = np.asarray(jax.device_get(codes))[0][:n]

        t_voc = time.perf_counter()
        audio = voc.synthesize_chunked(
            lambda ch: voc_fn(vp, jnp.asarray(ch)),
            codes_np, VOC_CHUNK_SIZE, VOC_OVERLAP)
        t_voc = time.perf_counter() - t_voc
        total = time.perf_counter() - t_start

        audio_s = len(audio) / SAMPLE_RATE
        rtf = total / audio_s if audio_s > 0 else float("inf")
        n_chunks = max(1, -(-max(n - VOC_CHUNK_SIZE, 0) //
                            (VOC_CHUNK_SIZE - VOC_OVERLAP)) + 1)
        rtfs.append(rtf)
        decode_ms_tok.append(t_decode / max(n, 1) * 1000)
        voc_s_chunk.append(t_voc / n_chunks)
        # first-audio estimate: time to first 64 tokens + one vocoder chunk
        first_audio.append(t_decode / max(n, 1) * min(n, VOC_CHUNK_SIZE)
                           + t_voc / n_chunks)
        log(f"trial {trial}: n={n} decode={t_decode:.3f}s "
            f"({decode_ms_tok[-1]:.2f} ms/tok) voc={t_voc:.3f}s "
            f"audio={audio_s:.2f}s RTF={rtf:.4f}")

    rtf = float(np.median(rtfs))
    log(f"median RTF={rtf:.4f}  decode={np.median(decode_ms_tok):.2f} ms/tok "
        f"voc={np.median(voc_s_chunk):.3f} s/chunk "
        f"first_audio~{np.median(first_audio):.3f}s "
        f"(targets: RTF<=0.1, first-audio<0.3s; reference RTF=2.0)")

    print(json.dumps({
        "metric": "rtf_e2e",
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(2.0 / rtf, 1) if rtf > 0 else None,
    }))


if __name__ == "__main__":
    main()
