#!/usr/bin/env python3
"""Socket client for the reference-protocol compatibility stack.

Speaks the reference's three wire protocols (SURVEY §2, distributed
communication backend) against serve/compat.py's sockets: streams
(code_0, hidden) from the talker, fetches groups 1..15 from the CP socket
per token, computes the feedback embedding host-side
(codec_emb[code_0] + Σ cp_emb[g][code_g] + tts_pad — tts_client.py:199-211
contract), and renders audio through the vocoder socket. Useful for
validating protocol compatibility and as a migration path for users of
the reference client.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTINEL_DONE = -1
SENTINEL_ERROR = -2


# one shared implementation of the framing-critical recv loop (the same
# helper compat.py imports; review finding — a verbatim fork here would
# miss future fixes)
from qwen3_tts_tpu.serve.daemon import _recv_exact  # noqa: E402


def synthesize_via_sockets(text, language, output, params,
                           talker_sock="/tmp/qwen3_talker.sock",
                           cp_sock="/tmp/qwen3_cp.sock",
                           voc_sock="/tmp/qwen3_voc.sock") -> int:
    import jax.numpy as jnp
    from qwen3_tts_tpu.config import SAMPLE_RATE, TTS_PAD_TOKEN_ID
    from qwen3_tts_tpu.io import wav as wav_io
    from qwen3_tts_tpu.models import talker as tk

    tp, cpp = params["talker"], params["code_predictor"]
    H = np.asarray(tp["codec_embedding"]).shape[1]
    codec_emb = np.asarray(tp["codec_embedding"], np.float32)
    cp_embs = np.asarray(cpp["codec_embs"], np.float32)
    tts_pad = np.asarray(
        tk.embed_text(tp, jnp.array([TTS_PAD_TOKEN_ID]))[0], np.float32)

    t_start = time.time()
    tc = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    tc.connect(talker_sock)
    msg = json.dumps({"text": text, "language": language}).encode()
    tc.sendall(struct.pack("<I", len(msg)) + msg)

    all_codes = []
    while True:
        raw = _recv_exact(tc, 4)
        if raw is None:
            break
        code0 = struct.unpack("<i", raw)[0]
        if code0 == SENTINEL_DONE:
            break
        if code0 == SENTINEL_ERROR:
            print("Talker error!")
            return 1
        hdat = _recv_exact(tc, H * 4)
        if hdat is None:
            print("Talker closed mid-stream (error sentinel or disconnect)")
            return 1
        hidden = np.frombuffer(hdat, np.float32)

        cc = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        cc.connect(cp_sock)
        cc.sendall(hidden.tobytes() + struct.pack("<i", code0))
        cdat = _recv_exact(cc, 60)
        if cdat is None:
            print("Code-predictor server closed mid-reply")
            return 1
        codes_1_15 = np.frombuffer(cdat, np.int32)
        cc.close()

        all_codes.append([code0] + codes_1_15.tolist())
        feedback = codec_emb[code0].copy()
        for g, tok in enumerate(codes_1_15):
            feedback += cp_embs[g][tok]
        feedback += tts_pad
        tc.sendall(feedback.astype(np.float32).tobytes())
        if len(all_codes) % 10 == 0:
            el = time.time() - t_start
            print(f"  [{len(all_codes)}] {len(all_codes)/el:.1f} tok/s")
    tc.close()

    if not all_codes:
        print("No tokens generated!")
        return 1

    vc = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    vc.connect(voc_sock)
    codes_arr = np.array(all_codes, np.int64)
    vc.sendall(struct.pack("<i", len(codes_arr)) + codes_arr.tobytes())
    vhdr = _recv_exact(vc, 4)
    if vhdr is None:
        print("Vocoder server closed before reply")
        return 1
    n_samples = struct.unpack("<i", vhdr)[0]
    adat = _recv_exact(vc, n_samples * 2)
    if adat is None:
        print("Vocoder server closed mid-reply")
        return 1
    audio = np.frombuffer(adat, np.int16)
    vc.close()

    wav_io.write_wav(output, audio)
    dur = len(audio) / SAMPLE_RATE
    total = time.time() - t_start
    print(f"Audio: {dur:.2f}s, saved to {output}")
    print(f"Total: {total:.1f}s (RTF={total/dur:.1f}x)")
    return 0
