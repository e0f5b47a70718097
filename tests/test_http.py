"""HTTP gateway tests (serve/http.py): same semantics as the Unix-socket
daemon, carried over TCP — blob responses as WAV, streaming as the
daemon's native frame protocol in a chunked body."""

import http.client
import io
import json
import wave

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import SAMPLE_RATE, tiny_tts_config
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.serve.daemon import TTSDaemon
from qwen3_tts_tpu.serve.http import HTTPFrameReader, serve_http


@pytest.fixture(scope="module")
def gateway():
    engine = TTSEngine(tiny_tts_config(max_tokens=8), model_dir=None,
                       dtype=jnp.float32)
    daemon = TTSDaemon(engine, socket_path="/tmp/unused_http_test.sock")
    srv = serve_http(daemon, host="127.0.0.1", port=0)
    host, port = srv.server_address
    yield engine, host, port
    srv.shutdown()


def _conn(gateway):
    _, host, port = gateway
    return http.client.HTTPConnection(host, port, timeout=300)


def test_health_and_stats(gateway):
    c = _conn(gateway)
    c.request("GET", "/health")
    r = c.getresponse()
    assert r.status == 200 and json.loads(r.read())["ok"] is True
    c.request("GET", "/v1/stats")
    r = c.getresponse()
    snap = json.loads(r.read())
    assert r.status == 200 and snap["mode"] == "engine"
    c.close()


def test_models_list_openai_shape(gateway):
    """GET /v1/models: the OpenAI SDK handshake route — a list object
    with one model entry whose id the speech route accepts."""
    c = _conn(gateway)
    c.request("GET", "/v1/models")
    r = c.getresponse()
    body = json.loads(r.read())
    assert r.status == 200 and body["object"] == "list"
    assert body["data"][0]["id"] == "qwen3-tts"
    assert body["data"][0]["object"] == "model"
    c.close()


def test_metrics_prometheus_exposition(gateway):
    """GET /metrics: counters as *_total, percentile summaries with
    quantile labels, parseable name/value lines."""
    c = _conn(gateway)
    # at least one request so percentile summaries exist
    c.request("POST", "/v1/synthesize", body=json.dumps(
        {"text": "metrics probe", "language": "english", "seed": 1}).encode())
    c.getresponse().read()
    c.request("GET", "/metrics")
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type").startswith("text/plain")
    text = r.read().decode()
    metrics = {}
    for line in text.strip().split("\n"):
        name, val = line.rsplit(" ", 1)
        metrics[name] = float(val)
    assert metrics["qwen3_tts_requests_total"] >= 1
    assert metrics["qwen3_tts_errors_total"] >= 0
    assert metrics["qwen3_tts_tokens_total"] >= 1
    assert 'qwen3_tts_rtf{quantile="0.5"}' in metrics
    assert 'qwen3_tts_total_seconds{quantile="0.95"}' in metrics
    assert metrics['qwen3_tts_mode_info{mode="engine"}'] == 1
    c.close()


def test_blob_synthesis_is_a_wav(gateway):
    engine, _, _ = gateway
    c = _conn(gateway)
    body = json.dumps({"text": "hello http", "language": "english",
                       "seed": 3}).encode()
    c.request("POST", "/v1/synthesize", body=body,
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    n_tokens = int(r.getheader("X-Ttsrt-n-tokens"))
    data = r.read()
    with wave.open(io.BytesIO(data), "r") as wf:
        assert wf.getframerate() == SAMPLE_RATE
        assert wf.getnchannels() == 1
        audio = np.frombuffer(wf.readframes(wf.getnframes()), np.int16)
    ref = engine.synthesize("hello http", language="english", seed=3)
    assert n_tokens == ref.n_tokens
    np.testing.assert_array_equal(audio, ref.audio_int16)
    c.close()


def test_stream_frames_concatenate_to_blob_audio(gateway):
    engine, _, _ = gateway
    c = _conn(gateway)
    body = json.dumps({"text": "hello http", "language": "english",
                       "seed": 3, "stream": True}).encode()
    c.request("POST", "/v1/synthesize", body=body)
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "application/x-ttsrt-frames"
    frames = list(HTTPFrameReader(r))     # http.client de-chunks
    assert frames, "no frames received"
    done_hdr = frames[-1][0]
    assert done_hdr.get("done") is True and "error" not in done_hdr
    audio = np.concatenate([a for h, a in frames if len(a)])
    # transport-fidelity check: bit-identical to the engine's own
    # streaming output (stream-vs-blob numeric parity is covered by
    # tests/test_engine.py; on CPU the two decode paddings can differ in
    # the last ulp at isolated samples)
    ref = engine.synthesize("hello http", language="english", seed=3,
                            streaming=True)
    np.testing.assert_array_equal(audio, ref.audio_int16)
    assert done_hdr["n_tokens"] == ref.n_tokens
    c.close()


def test_error_is_json_400(gateway):
    c = _conn(gateway)
    c.request("POST", "/v1/synthesize", body=json.dumps({"text": ""}).encode())
    r = c.getresponse()
    assert r.status == 400
    assert "error" in json.loads(r.read())
    # malformed body
    c.request("POST", "/v1/synthesize", body=b"{not json")
    r = c.getresponse()
    assert r.status == 400 and "error" in json.loads(r.read())
    c.close()


def test_unknown_route_404(gateway):
    c = _conn(gateway)
    c.request("GET", "/nope")
    r = c.getresponse()
    assert r.status == 404
    r.read()
    c.close()


def test_openai_speech_wav_matches_engine(gateway):
    """POST /v1/audio/speech (OpenAI-compatible surface): default wav
    response carries exactly the engine's synthesis."""
    engine, _, _ = gateway
    c = _conn(gateway)
    body = json.dumps({"model": "qwen3-tts", "input": "hello openai",
                       "language": "english", "seed": 3}).encode()
    c.request("POST", "/v1/audio/speech", body=body)
    r = c.getresponse()
    assert r.status == 200 and r.getheader("Content-Type") == "audio/wav"
    with wave.open(io.BytesIO(r.read()), "r") as wf:
        assert wf.getframerate() == SAMPLE_RATE
        audio = np.frombuffer(wf.readframes(wf.getnframes()), np.int16)
    ref = engine.synthesize("hello openai", language="english", seed=3)
    np.testing.assert_array_equal(audio, ref.audio_int16)
    c.close()


def test_openai_speech_pcm_and_stream(gateway):
    """response_format 'pcm' returns raw s16le bytes; stream mode chunks
    the same bytes as they render."""
    engine, _, _ = gateway
    c = _conn(gateway)
    req = {"input": "hello openai", "language": "english", "seed": 3,
           "response_format": "pcm"}
    c.request("POST", "/v1/audio/speech", body=json.dumps(req).encode())
    r = c.getresponse()
    assert r.status == 200 and r.getheader("Content-Type") == "audio/pcm"
    assert r.getheader("X-Ttsrt-Sample-Rate") == "24000"
    pcm = np.frombuffer(r.read(), np.int16)
    ref = engine.synthesize("hello openai", language="english", seed=3)
    np.testing.assert_array_equal(pcm, ref.audio_int16)

    c.request("POST", "/v1/audio/speech",
              body=json.dumps(dict(req, stream=True)).encode())
    r = c.getresponse()
    assert r.status == 200 and r.getheader("Content-Type") == "audio/pcm"
    streamed = np.frombuffer(r.read(), np.int16)  # http.client de-chunks
    ref_s = engine.synthesize("hello openai", language="english", seed=3,
                              streaming=True)
    np.testing.assert_array_equal(streamed, ref_s.audio_int16)
    c.close()


def test_openai_speech_validation_errors(gateway):
    """Invalid requests come back as the OpenAI error envelope with the
    offending param named — including stream-mode requests (pre-validated
    before headers go out)."""
    c = _conn(gateway)
    cases = [
        ({"input": ""}, "input"),
        ({"input": "x", "response_format": "mp3"}, "response_format"),
        ({"input": "x", "speed": 1.5}, "speed"),
        ({"input": "x", "stream": True}, "response_format"),  # wav+stream
        ({"input": "x", "voice": "/nonexistent/dir"}, "voice"),
        ({"input": "x", "language": "klingon", "stream": True,
          "response_format": "pcm"}, "language"),
        ({"input": "x", "max_tokens": 0}, "max_tokens"),
    ]
    for body, param in cases:
        c.request("POST", "/v1/audio/speech", body=json.dumps(body).encode())
        r = c.getresponse()
        err = json.loads(r.read())["error"]
        assert r.status == 400, body
        assert err["param"] == param and err["type"] == "invalid_request_error"
    c.close()


def test_openai_stream_error_aborts_transfer(gateway, tmp_path):
    """A post-header failure in stream mode must NOT end as a clean,
    well-terminated empty stream: the gateway aborts the chunked body so
    the client sees a transport error (review finding). Triggered by a
    voice dir that passes the pre-checks but holds a corrupt
    ref_codec_tokens.npy."""
    bad = tmp_path / "voice"
    bad.mkdir()
    (bad / "ref_codec_tokens.npy").write_bytes(b"definitely not npy")
    c = _conn(gateway)
    c.request("POST", "/v1/audio/speech", body=json.dumps(
        {"input": "x", "response_format": "pcm", "stream": True,
         "voice": str(bad)}).encode())
    r = c.getresponse()
    assert r.status == 200  # headers were already out
    with pytest.raises(Exception):  # IncompleteRead / connection error
        r.read()
    c.close()


def test_openai_bad_voice_content_is_400(gateway, tmp_path):
    """Non-stream: a corrupt voice dir maps to 400 param=voice (the
    engine's prompt_dir errors are client-fixable), while the error
    envelope type stays invalid_request_error."""
    bad = tmp_path / "voice"
    bad.mkdir()
    (bad / "ref_codec_tokens.npy").write_bytes(b"definitely not npy")
    c = _conn(gateway)
    c.request("POST", "/v1/audio/speech", body=json.dumps(
        {"input": "x", "voice": str(bad)}).encode())
    r = c.getresponse()
    err = json.loads(r.read())["error"]
    assert r.status == 400 and err["param"] == "voice"
    # bad seed types are 400 too, not a dropped connection
    c.request("POST", "/v1/audio/speech", body=json.dumps(
        {"input": "x", "seed": "abc"}).encode())
    r = c.getresponse()
    err = json.loads(r.read())["error"]
    assert r.status == 400 and err["param"] == "seed"
    c.close()


def test_openai_speech_through_batched_daemon(gateway, tmp_path):
    """The OpenAI surface works unchanged in front of a batched daemon:
    concurrent pcm requests share the decode batch; a valid 'voice'
    (prompt_dir) is SERVED through the batched cloned admission, and an
    invalid one is still a 400 param=voice."""
    import threading
    from qwen3_tts_tpu.serve.batching import ContinuousBatcher

    engine, _, _ = gateway
    batcher = ContinuousBatcher(engine.cfg, engine.params, batch_size=2,
                                decode_chunk=4, dtype=jnp.float32)
    daemon = TTSDaemon(engine, socket_path="/tmp/unused_http_batched.sock",
                       batcher=batcher)
    srv = serve_http(daemon, host="127.0.0.1", port=0)
    host, port = srv.server_address
    batcher.start()
    try:
        results = {}

        def call(i):
            c = http.client.HTTPConnection(host, port, timeout=300)
            c.request("POST", "/v1/audio/speech", body=json.dumps(
                {"input": f"req {i}", "language": "english", "seed": i,
                 "response_format": "pcm"}).encode())
            r = c.getresponse()
            results[i] = (r.status, np.frombuffer(r.read(), np.int16))
            c.close()

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 3
        for i, (status, pcm) in results.items():
            assert status == 200 and len(pcm) % 1920 == 0 and len(pcm) > 0

        # a VALID voice dir serves through the batched cloned admission
        d = tmp_path / "http_voice"
        d.mkdir()
        V = engine.cfg.code_predictor.group_vocab_size
        np.save(d / "ref_codec_tokens.npy",
                np.random.default_rng(3).integers(0, V, (6, 16)).astype(
                    np.int64))
        (d / "ref_text.txt").write_text("ref transcript")
        c = http.client.HTTPConnection(host, port, timeout=300)
        c.request("POST", "/v1/audio/speech", body=json.dumps(
            {"input": "cloned over http", "language": "english", "seed": 9,
             "voice": str(d), "response_format": "pcm"}).encode())
        r = c.getresponse()
        pcm = np.frombuffer(r.read(), np.int16)
        assert r.status == 200 and len(pcm) > 0 and len(pcm) % 1920 == 0
        c.close()

        c = http.client.HTTPConnection(host, port, timeout=300)
        c.request("POST", "/v1/audio/speech", body=json.dumps(
            {"input": "x", "voice": "/tmp"}).encode())
        r = c.getresponse()
        assert r.status == 400
        assert json.loads(r.read())["error"]["param"] == "voice"
        c.close()
    finally:
        srv.shutdown()
        batcher.stop()


def test_stream_error_arrives_as_done_frame(gateway):
    """Early failures in stream mode must reach HTTP clients as a
    terminal done-frame with the error — not as a clean empty stream
    (review finding: handle() returns early errors as a blob that the
    gateway previously discarded)."""
    c = _conn(gateway)
    c.request("POST", "/v1/synthesize",
              body=json.dumps({"text": "", "stream": True}).encode())
    r = c.getresponse()
    assert r.status == 200   # headers are already out in stream mode
    frames = list(HTTPFrameReader(r))
    assert len(frames) == 1
    hdr, audio = frames[0]
    assert "error" in hdr and hdr.get("done") is True and len(audio) == 0
    c.close()


def test_stalled_client_times_out_without_wedging(gateway):
    """A client that stalls mid-request must not hold the handler thread
    (and, in engine mode, the engine_lock) forever: _Handler.timeout
    bounds every socket read/write, so the stalled connection dies and
    subsequent requests keep working (review finding: an unbounded
    streaming client would wedge BOTH transports)."""
    import socket
    import time

    engine, host, port = gateway
    # a dedicated gateway with a short timeout so the test is fast
    daemon = TTSDaemon(engine, socket_path="/tmp/unused_http_stall.sock")
    srv = serve_http(daemon, host="127.0.0.1", port=0, client_timeout=1.0)
    h, p = srv.server_address
    try:
        # stall: declare a body we never send — rfile.read(n) blocks
        # until the socket timeout fires and the handler thread exits
        s = socket.create_connection((h, p))
        s.sendall(b"POST /v1/synthesize HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Length: 100\r\n\r\n")
        time.sleep(1.5)   # > client_timeout

        # the gateway must still serve other clients
        c = http.client.HTTPConnection(h, p, timeout=60)
        c.request("GET", "/health")
        r = c.getresponse()
        assert r.status == 200 and json.loads(r.read())["ok"] is True
        c.request("POST", "/v1/synthesize", body=json.dumps(
            {"text": "after stall", "language": "english",
             "seed": 2}).encode())
        r = c.getresponse()
        assert r.status == 200
        assert len(r.read()) > 44   # a real WAV, not an error JSON
        c.close()
        s.close()
    finally:
        srv.shutdown()


def test_overloaded_maps_to_503(gateway):
    """Batcher backpressure (max_queue) surfaces as HTTP 503 +
    Retry-After on both routes: the native route keeps the daemon's
    structured {"error", "code": "overloaded"} envelope, the OpenAI
    route uses type "overloaded_error"."""
    from qwen3_tts_tpu.serve.batching import ContinuousBatcher

    engine, _, _ = gateway
    # max_queue=0: every submit sheds immediately — no scheduler needed
    batcher = ContinuousBatcher(engine.cfg, engine.params, batch_size=2,
                                decode_chunk=4, dtype=jnp.float32,
                                max_queue=0)
    daemon = TTSDaemon(engine, socket_path="/tmp/unused_http_503.sock",
                       batcher=batcher)
    srv = serve_http(daemon, host="127.0.0.1", port=0)
    host, port = srv.server_address
    try:
        c = http.client.HTTPConnection(host, port, timeout=300)
        c.request("POST", "/v1/synthesize", body=json.dumps(
            {"text": "x", "language": "english"}).encode())
        r = c.getresponse()
        hdr = json.loads(r.read())
        assert r.status == 503 and hdr["code"] == "overloaded"
        assert r.getheader("Retry-After") == "1"

        c.request("POST", "/v1/audio/speech", body=json.dumps(
            {"input": "x", "language": "english"}).encode())
        r = c.getresponse()
        err = json.loads(r.read())["error"]
        assert r.status == 503 and err["type"] == "overloaded_error"
        assert r.getheader("Retry-After") == "1"
        c.close()
    finally:
        srv.shutdown()


def test_http_rejects_oversized_content_length(gateway):
    """First-party ingest bound (round-4 VERDICT Weak #4): both POST
    routes must reject a Content-Length past the cap with 413 BEFORE
    reading the body (the declared size alone triggers the rejection),
    and invalid lengths with 400."""
    from qwen3_tts_tpu.serve.http import MAX_BODY_BYTES

    for route in ("/v1/synthesize", "/v1/audio/speech"):
        c = _conn(gateway)
        c.putrequest("POST", route)
        c.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        c.endheaders()          # never send the body
        r = c.getresponse()
        body = json.loads(r.read())
        assert r.status == 413, (route, r.status, body)
        err = body["error"]
        msg = err["message"] if isinstance(err, dict) else err
        assert "too large" in msg
        c.close()

    # malformed Content-Length -> 400, not a crash
    c = _conn(gateway)
    c.putrequest("POST", "/v1/synthesize")
    c.putheader("Content-Length", "banana")
    c.endheaders()
    r = c.getresponse()
    assert r.status == 400
    r.read()
    c.close()

    # gateway still serves real requests afterwards
    c = _conn(gateway)
    c.request("POST", "/v1/synthesize", body=json.dumps(
        {"text": "after 413", "language": "english", "seed": 1}).encode())
    r = c.getresponse()
    assert r.status == 200
    r.read()
    c.close()
