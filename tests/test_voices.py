"""Voice registry (serve/voices.py): named voices for the serving tiers.

The reference preps prompt_dirs (scripts/encode_reference_audio.py) but
addresses them by path; the registry adds a name surface on the daemon
protocol ("voice" field), the OpenAI route, and GET /v1/audio/voices.
"""

import http.client
import json

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.serve.daemon import TTSDaemon, decode_response
from qwen3_tts_tpu.serve.http import serve_http
from qwen3_tts_tpu.serve.voices import VoiceRegistry, is_prompt_dir


def _mk_prompt(root, name, seed, V=32):
    d = root / name
    d.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    np.save(d / "ref_codec_tokens.npy",
            rng.integers(0, V, (6, 16)).astype(np.int64))
    (d / "ref_text.txt").write_text(f"ref transcript {name}")
    return str(d)


# -- registry unit tests ------------------------------------------------------

def test_registry_scans_root(tmp_path):
    _mk_prompt(tmp_path, "alice", 1)
    _mk_prompt(tmp_path, "bob", 2)
    (tmp_path / "not_a_voice").mkdir()          # no ref_codec_tokens.npy
    (tmp_path / "loose_file.txt").write_text("x")
    reg = VoiceRegistry(str(tmp_path))
    assert reg.names() == ["alice", "bob"]
    assert reg.resolve("alice") == str(tmp_path / "alice")
    assert reg.resolve("not_a_voice") is None
    assert reg.resolve("default") is None
    assert len(reg) == 2


def test_registry_validation(tmp_path):
    with pytest.raises(ValueError, match="not a directory"):
        VoiceRegistry(str(tmp_path / "missing"))
    reg = VoiceRegistry()
    with pytest.raises(ValueError, match="invalid voice name"):
        reg.register("default", str(tmp_path))
    with pytest.raises(ValueError, match="not a prompt_dir"):
        reg.register("x", str(tmp_path))
    assert not is_prompt_dir(str(tmp_path / "nope"))


# -- daemon + HTTP integration ------------------------------------------------

@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    root = tmp_path_factory.mktemp("voices")
    p_alice = _mk_prompt(root, "alice", 7)
    engine = TTSEngine(tiny_tts_config(max_tokens=8), model_dir=None,
                       dtype=jnp.float32)
    reg = VoiceRegistry(str(root))
    daemon = TTSDaemon(engine, socket_path="/tmp/unused_voices_test.sock",
                       voices=reg)
    srv = serve_http(daemon, host="127.0.0.1", port=0)
    host, port = srv.server_address
    yield engine, daemon, host, port, p_alice
    srv.shutdown()


def test_daemon_voice_name_matches_prompt_dir(stack):
    """A 'voice' name on the native protocol produces byte-identical
    audio to the same request with the underlying prompt_dir."""
    engine, daemon, _, _, p_alice = stack
    by_name = daemon.handle(json.dumps(
        {"text": "hello", "language": "english", "seed": 4,
         "voice": "alice"}).encode())
    by_path = daemon.handle(json.dumps(
        {"text": "hello", "language": "english", "seed": 4,
         "prompt_dir": p_alice}).encode())
    h1, a1 = decode_response(by_name)
    h2, a2 = decode_response(by_path)
    assert "error" not in h1 and "error" not in h2
    assert h1["n_tokens"] == h2["n_tokens"]
    np.testing.assert_array_equal(a1, a2)


def test_daemon_voice_errors(stack):
    _, daemon, _, _, p_alice = stack
    h, _ = decode_response(daemon.handle(json.dumps(
        {"text": "x", "voice": "nobody"}).encode()))
    assert "unknown voice 'nobody'" in h["error"] and "alice" in h["error"]
    h, _ = decode_response(daemon.handle(json.dumps(
        {"text": "x", "voice": "alice", "prompt_dir": p_alice}).encode()))
    assert "not both" in h["error"]
    # "default" and "" are the unconditioned voice, not errors
    h, _ = decode_response(daemon.handle(json.dumps(
        {"text": "x", "language": "english", "voice": "default",
         "seed": 0}).encode()))
    assert "error" not in h


def test_http_voices_listing(stack):
    _, _, host, port, _ = stack
    c = http.client.HTTPConnection(host, port, timeout=300)
    c.request("GET", "/v1/audio/voices")
    r = c.getresponse()
    body = json.loads(r.read())
    assert r.status == 200 and body["object"] == "list"
    names = [v["name"] for v in body["data"]]
    assert names == ["default", "alice"]
    c.close()


def test_openai_speech_by_voice_name(stack):
    """The OpenAI route resolves registry names; unknown names 400 with
    the available list."""
    engine, _, host, port, p_alice = stack
    c = http.client.HTTPConnection(host, port, timeout=300)
    c.request("POST", "/v1/audio/speech", body=json.dumps(
        {"input": "hello", "language": "english", "seed": 4,
         "voice": "alice", "response_format": "pcm"}).encode())
    r = c.getresponse()
    assert r.status == 200
    pcm = np.frombuffer(r.read(), np.int16)
    ref = engine.synthesize("hello", language="english", seed=4,
                            prompt_dir=p_alice)
    np.testing.assert_array_equal(pcm, ref.audio_int16)

    c.request("POST", "/v1/audio/speech", body=json.dumps(
        {"input": "x", "voice": "nobody"}).encode())
    r = c.getresponse()
    err = json.loads(r.read())["error"]
    assert r.status == 400 and err["param"] == "voice"
    assert "alice" in err["message"]
    c.close()
