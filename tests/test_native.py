"""Native runtime (libttsrt) tests: npy/safetensors IO, WAV, daemon framing."""

import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from qwen3_tts_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libttsrt not built")


def test_npy_roundtrip(tmp_path):
    p = str(tmp_path / "a.npy")
    a = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    native.npy_write(p, a)
    b = native.npy_read(p)
    np.testing.assert_array_equal(a, b)
    # cross-check with numpy's own reader/writer
    c = np.load(p)
    np.testing.assert_array_equal(a, c)
    np.save(str(tmp_path / "b.npy"), a)
    d = native.npy_read(str(tmp_path / "b.npy"))
    np.testing.assert_array_equal(a, d)


def test_npy_int64_and_f64(tmp_path):
    p = str(tmp_path / "i.npy")
    a = np.arange(24, dtype=np.int64).reshape(2, 3, 4)
    native.npy_write(p, a)
    np.testing.assert_array_equal(native.npy_read(p), a)
    # f8 -> auto converts to f4 on native read (reference reader behavior)
    f = np.random.default_rng(1).normal(size=(4,)).astype(np.float64)
    np.save(str(tmp_path / "f.npy"), f)
    got = native.npy_read(str(tmp_path / "f.npy"))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, f.astype(np.float32), rtol=1e-6)


def test_safetensors_zero_copy(tmp_path):
    from safetensors.numpy import save_file
    p = str(tmp_path / "w.safetensors")
    tensors = {
        "a": np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32),
        "b.c": np.arange(10, dtype=np.int64),
    }
    save_file(tensors, p)
    f = native.SafetensorsFile(p)
    assert set(f.keys()) == {"a", "b.c"}
    np.testing.assert_array_equal(f.tensor("a"), tensors["a"])
    np.testing.assert_array_equal(f.tensor("b.c"), tensors["b.c"])
    with pytest.raises(KeyError):
        f.tensor("missing")
    f.close()


def test_wav_write(tmp_path):
    from qwen3_tts_tpu.io.wav import read_wav
    p = str(tmp_path / "x.wav")
    a = (np.sin(np.linspace(0, 100, 2400)) * 20000).astype(np.int16)
    native.wav_write(p, a, 24000)
    audio, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(audio * 32768.0, a, atol=1.0)


def test_f32_to_i16_clip():
    out = native.f32_to_i16(np.array([0.5, -2.0, 2.0], np.float32))
    assert out.dtype == np.int16
    assert out[1] == -32768 and out[2] == 32767
    assert out[0] == int(0.5 * 32767)


def test_serve_unix_roundtrip(tmp_path):
    sock_path = str(tmp_path / "d.sock")

    def handler(req: bytes, send_frame):
        if req == b"stream":
            send_frame(b"frame0")
            send_frame(b"frame1")
            return None
        return b"echo:" + req

    # the stop flag is process-global and STICKY (a racing stop() must
    # not be erased by the loop entry) — raw serve_unix callers re-arm
    native.serve_reset()
    t = threading.Thread(target=native.serve_unix,
                         args=(sock_path, handler), daemon=True)
    t.start()
    deadline = time.time() + 5
    while not os.path.exists(sock_path) and time.time() < deadline:
        time.sleep(0.05)
    assert os.path.exists(sock_path)

    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sock_path)
        msg = b"hello"
        c.sendall(struct.pack("<I", len(msg)) + msg)
        raw = c.recv(4)
        n = struct.unpack("<I", raw)[0]
        data = b""
        while len(data) < n:
            data += c.recv(n - len(data))
        assert data == b"echo:hello"
        c.close()

        # chunked mode: the handler writes its own frames and returns None
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sock_path)
        msg = b"stream"
        c.sendall(struct.pack("<I", len(msg)) + msg)
        got = []
        for _ in range(2):
            raw = b""
            while len(raw) < 4:
                raw += c.recv(4 - len(raw))
            n = struct.unpack("<I", raw)[0]
            data = b""
            while len(data) < n:
                data += c.recv(n - len(data))
            got.append(data)
        assert got == [b"frame0", b"frame1"]
        c.close()
    finally:
        native.serve_stop()
        t.join(timeout=3)


def test_truncated_safetensors_rejected_not_sigbus(tmp_path):
    """A checkpoint with an intact header but truncated data must fail
    the native open (falling back to the Python reader's catchable
    error), never read past the mmap (SIGBUS; review finding)."""
    import json as _json

    names = {f"t{i}": None for i in range(2)}
    hdr = {}
    off = 0
    for name in names:
        hdr[name] = {"dtype": "F32", "shape": [4, 4],
                     "data_offsets": [off, off + 64]}
        off += 64
    hjs = _json.dumps(hdr).encode()
    blob = struct.pack("<Q", len(hjs)) + hjs + b"\x00" * off
    good = tmp_path / "good.safetensors"
    good.write_bytes(blob)
    trunc = tmp_path / "trunc.safetensors"
    trunc.write_bytes(blob[:-40])  # header intact, data cut short

    if native.available():
        lib = native._load()
        h = lib.ttsrt_st_open(str(good).encode())
        assert h, "valid file must open"
        lib.ttsrt_st_close(h)
        assert not lib.ttsrt_st_open(str(trunc).encode())

        # corrupt header numbers must error, not hang/accept
        bad_hdr = _json.dumps(
            {"t": {"dtype": "F32", "shape": [1, None],
                   "data_offsets": [0, 4]}}).replace("None", "null").encode()
        bad = tmp_path / "bad.safetensors"
        bad.write_bytes(struct.pack("<Q", len(bad_hdr)) + bad_hdr + b"\x00" * 4)
        assert not lib.ttsrt_st_open(str(bad).encode())

        # absurd header length (wraps 8+hlen) must be rejected
        huge = tmp_path / "huge.safetensors"
        huge.write_bytes(struct.pack("<Q", 2**64 - 4) + b"{}" + b"\x00" * 16)
        assert not lib.ttsrt_st_open(str(huge).encode())
