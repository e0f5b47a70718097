"""Reference-protocol compatibility tests: drive the three sockets with a
client speaking exactly the reference's wire formats
(tts_client.py:123-216, code_predictor protocol, vocoder protocol)."""

import json
import socket
import struct
import threading
import time
import os

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.io.tokenizer import ByteFallbackTokenizer
from qwen3_tts_tpu.serve import compat

TTS = tiny_tts_config(max_tokens=6)


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    params = weights_io.init_random_params(TTS, seed=0, dtype=jnp.float32)
    base = str(tmp_path_factory.mktemp("sock"))
    paths = (f"{base}/talker.sock", f"{base}/cp.sock", f"{base}/voc.sock")
    servers, threads = compat.launch_all(
        params, TTS, ByteFallbackTokenizer(), *paths)
    deadline = time.time() + 15
    while time.time() < deadline and not all(os.path.exists(p) for p in paths):
        time.sleep(0.05)
    assert all(os.path.exists(p) for p in paths)
    yield params, paths
    for s in servers:
        s.stop()


def _recv_exact(c, n):
    data = b""
    while len(data) < n:
        chunk = c.recv(n - len(data))
        if not chunk:
            return None
        data += chunk
    return data


def test_full_reference_client_flow(stack):
    """Run the reference client's exact per-token loop over the sockets:
    talker -> (code_0, hidden) -> CP socket -> 15 codes -> feedback ->
    talker; finally vocoder socket -> int16 audio."""
    params, (talker_sock, cp_sock, voc_sock) = stack
    H = TTS.talker.hidden_size
    tp, cpp = params["talker"], params["code_predictor"]

    tc = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    tc.connect(talker_sock)
    msg = json.dumps({"text": "hello", "language": "russian"}).encode()
    tc.sendall(struct.pack("<I", len(msg)) + msg)

    # host-side feedback pieces (as the reference client computes them)
    codec_emb = np.asarray(tp["codec_embedding"], np.float32)
    cp_embs = np.asarray(cpp["codec_embs"], np.float32)
    from qwen3_tts_tpu.models import talker as tk
    tts_pad = np.asarray(tk.embed_text(tp, jnp.array([151671]))[0], np.float32)

    all_codes = []
    while True:
        raw = _recv_exact(tc, 4)
        assert raw is not None
        code0 = struct.unpack("<i", raw)[0]
        if code0 == compat.SENTINEL_DONE:
            break
        assert code0 != compat.SENTINEL_ERROR
        hidden = np.frombuffer(_recv_exact(tc, H * 4), np.float32)

        cc = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        cc.connect(cp_sock)
        cc.sendall(hidden.tobytes() + struct.pack("<i", code0))
        codes_1_15 = np.frombuffer(_recv_exact(cc, 60), np.int32)
        cc.close()
        assert codes_1_15.shape == (15,)
        assert (codes_1_15 >= 0).all() and (codes_1_15 < 2048).all()
        all_codes.append([code0] + codes_1_15.tolist())

        feedback = codec_emb[code0].copy()
        for g, tok in enumerate(codes_1_15):
            feedback += cp_embs[g][tok]
        feedback += tts_pad
        tc.sendall(feedback.astype(np.float32).tobytes())
    tc.close()

    assert 0 < len(all_codes) <= TTS.max_tokens

    # vocoder protocol
    vc = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    vc.connect(voc_sock)
    codes_arr = np.array(all_codes, np.int64)
    vc.sendall(struct.pack("<i", len(codes_arr)) + codes_arr.tobytes())
    n_samples = struct.unpack("<i", _recv_exact(vc, 4))[0]
    audio = np.frombuffer(_recv_exact(vc, n_samples * 2), np.int16)
    vc.close()
    assert n_samples == len(all_codes) * 1920
    assert len(audio) == n_samples


def test_talker_oversized_header_rejected(stack):
    _, (talker_sock, _, _) = stack
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(talker_sock)
    c.sendall(struct.pack("<I", 1 << 20))  # > 64 KiB bound
    raw = _recv_exact(c, 4)
    assert struct.unpack("<i", raw)[0] == compat.SENTINEL_ERROR
    c.close()


def test_vocoder_rejects_bad_counts(stack):
    _, (_, _, voc_sock) = stack
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(voc_sock)
    c.sendall(struct.pack("<i", -5))
    c.settimeout(2.0)
    # server closes without response
    try:
        data = c.recv(4)
    except (socket.timeout, ConnectionResetError):
        data = b""
    assert data == b""
    c.close()


def test_talker_overlong_text_truncates_not_crashes(stack):
    """A text whose token count exceeds the KV allocation must be served
    (truncated, like the engine path) instead of dying in prefill with a
    shape error (round-1 VERDICT item 9 / advisor finding)."""
    _, (talker_sock, _, _) = stack
    H = TTS.talker.hidden_size
    # tiny config max_seq_len=128; ~300 chars >> 128-PREFIX_EXTRA tokens
    text = "x" * 300
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(talker_sock)
    msg = json.dumps({"text": text, "language": "russian"}).encode()
    c.sendall(struct.pack("<I", len(msg)) + msg)
    # must produce at least one (code, hidden) or a clean DONE — never a
    # dropped connection from a compile crash
    raw = _recv_exact(c, 4)
    assert raw is not None
    code0 = struct.unpack("<i", raw)[0]
    assert code0 != compat.SENTINEL_ERROR
    if code0 >= 0:
        hid = _recv_exact(c, H * 4)
        assert hid is not None
        # answer one feedback then hang up; server must survive
        c.sendall(np.zeros(H, np.float32).tobytes())
    c.close()
