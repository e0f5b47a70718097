"""Voice-cloning conditioning tests: the cloned dual-stream prefix
(models/talker.build_prefix_cloned) and the engine prompt_dir path.

The reference repo only PREPS the prompt_dir (scripts/
encode_reference_audio.py); its servers never consume it (SURVEY §0).
Here the prompt conditions the decode in-context: ref frames enter the
prefix via the exact feedback formula (tts_client.py:199-211)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.models import talker as tk


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_tts_config(max_tokens=8)
    params = weights_io.init_random_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


def test_cloned_prefix_layout(setup):
    """Frames occupy rows [base_len, base_len + n_ref) with the feedback
    formula; everything before matches the plain prefix; rows after the
    masked frames are zero."""
    cfg, params = setup
    tp = params["talker"]
    cp_embs = params["code_predictor"]["codec_embs"]
    ids = jnp.arange(5, dtype=jnp.int32)
    n_text = jnp.int32(5)
    V = cfg.code_predictor.group_vocab_size

    ref = jax.random.randint(jax.random.PRNGKey(1), (6, 16), 0, V, jnp.int32)
    n_ref = jnp.int32(4)

    base, base_len = tk.build_prefix(tp, ids, n_text)
    cloned, clen = tk.build_prefix_cloned(tp, cp_embs, ids, n_text, ref,
                                          n_ref)
    assert int(clen) == int(base_len) + 4
    assert cloned.shape[0] == base.shape[0] + 6

    np.testing.assert_allclose(np.asarray(cloned[:int(base_len)]),
                               np.asarray(base[:int(base_len)]), rtol=1e-6)
    frames = tk.clone_frame_embeds(tp, cp_embs, ref)
    np.testing.assert_allclose(
        np.asarray(cloned[int(base_len):int(clen)]),
        np.asarray(frames[:4]), rtol=1e-5, atol=1e-5)
    # masked-off frames (and base padding rows) contribute nothing
    assert float(jnp.abs(cloned[int(clen):]).max()) == 0.0


def test_feedback_formula(setup):
    """clone_frame_embeds == codec_emb[c0] + sum of CP group embeds +
    tts_pad_embed (tts_client.py:199-211)."""
    cfg, params = setup
    tp = params["talker"]
    cp_embs = np.asarray(params["code_predictor"]["codec_embs"])
    codes = np.array([[5, *range(15)]], np.int32)
    got = np.asarray(tk.clone_frame_embeds(
        tp, jnp.asarray(cp_embs), jnp.asarray(codes)))[0]
    ce = np.asarray(tp["codec_embedding"])
    pad_e = np.asarray(tk.embed_text(
        tp, jnp.array([tk.TTS_PAD_TOKEN_ID])))[0]
    want = ce[5] + sum(cp_embs[g][g] for g in range(15)) + pad_e
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_engine_prompt_dir(setup, tmp_path):
    """End-to-end synthesize with a prompt_dir: runs, deterministic, and
    conditions the output (different prompt -> different codes)."""
    cfg, params = setup
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32, params=params)
    V = cfg.code_predictor.group_vocab_size

    def mk_prompt(name, seed):
        d = tmp_path / name
        d.mkdir()
        codes = np.asarray(jax.random.randint(
            jax.random.PRNGKey(seed), (10, 16), 0, V, jnp.int32))
        np.save(d / "ref_codec_tokens.npy", codes.astype(np.int64))
        (d / "ref_text.txt").write_text("ref transcript")
        return str(d)

    p1 = mk_prompt("p1", 1)
    p2 = mk_prompt("p2", 2)

    a = eng.synthesize("hello", language="english", seed=0, prompt_dir=p1)
    b = eng.synthesize("hello", language="english", seed=0, prompt_dir=p1)
    c = eng.synthesize("hello", language="english", seed=0, prompt_dir=p2)
    d = eng.synthesize("hello", language="english", seed=0)

    assert a.n_tokens > 0
    np.testing.assert_array_equal(a.codes, b.codes)  # deterministic + cache
    assert not np.array_equal(a.codes, c.codes)      # prompt conditions
    assert not np.array_equal(a.codes, d.codes)      # differs from no-prompt


def test_streaming_with_prompt_dir(setup, tmp_path):
    """Voice cloning composes with streaming: the cloned prefill feeds the
    head-chunk schedule and streaming equals non-streaming codes."""
    cfg, params = setup
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32, params=params)
    V = cfg.code_predictor.group_vocab_size
    d = tmp_path / "ps"
    d.mkdir()
    codes = np.asarray(jax.random.randint(
        jax.random.PRNGKey(3), (6, 16), 0, V, jnp.int32))
    np.save(d / "ref_codec_tokens.npy", codes.astype(np.int64))
    (d / "ref_text.txt").write_text("ref words")

    a = eng.synthesize("clone me", language="english", seed=1,
                       prompt_dir=str(d))
    b = eng.synthesize("clone me", language="english", seed=1,
                       prompt_dir=str(d), streaming=True)
    np.testing.assert_array_equal(a.codes, b.codes)
    assert b.n_tokens > 0


@pytest.mark.parametrize("paged", [False, True])
def test_batched_prompt_matches_engine(setup, tmp_path, paged):
    """Voice cloning through the BATCHED serving tier: a cloned request
    submitted to the ContinuousBatcher (dense and paged) must produce
    EXACTLY the codes of the engine's prompt_dir path with the same seed
    (shared bucket_ref_frames clamp + identical cloned prefill)."""
    from qwen3_tts_tpu.serve.batching import ContinuousBatcher

    cfg, params = setup
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32, params=params)
    V = cfg.code_predictor.group_vocab_size
    d = tmp_path / f"pb{int(paged)}"
    d.mkdir()
    ref = np.asarray(jax.random.randint(
        jax.random.PRNGKey(9), (7, 16), 0, V, jnp.int32))
    np.save(d / "ref_codec_tokens.npy", ref.astype(np.int64))
    (d / "ref_text.txt").write_text("ref words here")

    res = eng.synthesize("clone batched", language="english", seed=4,
                         prompt_dir=str(d))
    assert res.n_tokens > 0

    # the daemon's _encode_with_prompt construction (shared helper)
    ref_codes, ref_text = eng._load_prompt(str(d))
    ids, n_text, n_target = eng._encode_cloned("clone batched", ref_text)

    # quantize_cp=False: the engine reference runs the float32 CP, so the
    # batcher must too for bit parity
    b = ContinuousBatcher(cfg, params, batch_size=2, decode_chunk=4,
                          dtype=jnp.float32, paged=paged, page_size=16,
                          quantize_cp=False)
    # occupy the other slot to prove cloning coexists with plain requests
    ids_o, n_o = eng._encode_text("plain neighbor")
    f_o = b.submit(np.asarray(ids_o), int(n_o), seed=1)
    f = b.submit(np.asarray(ids), int(n_text), seed=4,
                 ref_codes=ref_codes, n_target=n_target)
    for _ in range(400):
        if f.done() and f_o.done():
            break
        b.step()
    codes, audio = f.result(timeout=1)
    np.testing.assert_array_equal(codes, res.codes)
    assert len(audio) == len(codes) * 1920
    f_o.result(timeout=1)


def test_cloned_paged_depth2_no_truncation(setup):
    """Regression (review finding): the admission pos mirror must include
    the cloned prefix's reference rows — without them the paged top-up
    under-provisions pages at pipeline_depth=2 and the slot silently
    freezes at its page capacity. A cloned request with n_ref >=
    decode_chunk must produce identical codes at depth 1 and depth 2."""
    import dataclasses

    from qwen3_tts_tpu.config import tiny_tts_config
    from qwen3_tts_tpu.io import weights as weights_io
    from qwen3_tts_tpu.serve.batching import ContinuousBatcher

    cfg = tiny_tts_config(max_tokens=24)
    params = weights_io.init_random_params(cfg, seed=0, dtype=jnp.float32)
    V = cfg.code_predictor.group_vocab_size
    ref = np.asarray(jax.random.randint(
        jax.random.PRNGKey(11), (16, 16), 0, V, jnp.int32))
    ids = np.zeros(8, np.int32)
    ids[:6] = [ord(c) % 1000 for c in "клонир"]
    # geometry chosen so the broken mirror actually starves pages: with
    # text_pad 8 + PREFIX_EXTRA 9 + ref bucket 16 = p_pad 33 and psz 8,
    # admission provisions ceil((33+12+2)/8)=6 pages = 48 rows; real pos
    # after prefill is 6+9+16=31, so two skipped-top-up chunks of 12 hit
    # the 48-row capacity (31+2*12 > 47) while the stale mirror (15)
    # shows 33 rows of headroom >= the 2*12+2 threshold

    out = {}
    for depth in (1, 2):
        b = ContinuousBatcher(cfg, params, batch_size=2, decode_chunk=12,
                              dtype=jnp.float32, paged=True, page_size=8,
                              pipeline_depth=depth, quantize_cp=False)
        # warm the pipeline FIRST so the cloned request admits at a step
        # whose status mirror came from a harvest stash (admission at the
        # very first step falls back to a fresh device fetch, which hides
        # the stale-mirror starvation)
        f_bg = b.submit(np.arange(8, dtype=np.int32), 5, seed=1)
        for _ in range(3):
            b.step()
        f = b.submit(ids, 6, seed=12, ref_codes=ref, n_target=6)
        for _ in range(400):
            if f.done() and f_bg.done():
                break
            b.step()
        out[depth] = f.result(timeout=1)[0]
        f_bg.result(timeout=1)
    np.testing.assert_array_equal(out[1], out[2])
    assert len(out[1]) > 0


def test_bucket_ref_frames_long_reference():
    """A reference past the largest shape bucket (>256 frames) pads to a
    64-aligned bucket of the KEPT length clamped to the limit — not to
    the whole limit (which would allocate the slot's entire KV budget
    and compile one prefill per (text-bucket, cap) combination; review
    finding)."""
    ref = np.ones((300, 16), np.int32)
    padded, n_ref = tk.bucket_ref_frames(500, ref)
    assert n_ref == 300
    assert padded.shape == (320, 16)          # 64-aligned, NOT 500
    assert (padded[:300] == 1).all() and (padded[300:] == 0).all()

    # limit tighter than the 64-aligned bucket: clamp to the limit
    padded, n_ref = tk.bucket_ref_frames(310, ref)
    assert n_ref == 300 and padded.shape == (310, 16)

    # limit below the smallest bucket still truncates + fits
    padded, n_ref = tk.bucket_ref_frames(10, ref)
    assert n_ref == 10 and padded.shape == (10, 16)

    # in-bucket behavior unchanged
    padded, n_ref = tk.bucket_ref_frames(500, ref[:100])
    assert n_ref == 100 and padded.shape == (128, 16)


def test_dense_cloned_boundary_fails_cleanly(setup):
    """A cloning request whose text alone exactly fills the dense KV
    allocation must fail with the crafted ValueError, not an XLA shape
    error: bucket_ref_frames always returns a >= 1-row pad bucket, so the
    admission precheck must count it (review finding)."""
    from qwen3_tts_tpu.models.talker import PREFIX_EXTRA
    from qwen3_tts_tpu.serve.batching import ContinuousBatcher

    cfg, params = setup
    S = cfg.talker.max_seq_len
    b = ContinuousBatcher(cfg, params, batch_size=1, decode_chunk=4,
                          dtype=jnp.float32)
    ids = np.arange(S - PREFIX_EXTRA, dtype=np.int32)   # p_pad == S exactly
    f = b.submit(ids, len(ids), seed=0,
                 ref_codes=np.ones((4, 16), np.int32), n_target=4)
    for _ in range(200):
        if f.done():
            break
        b.step()
    with pytest.raises(ValueError, match="exceeds the dense KV"):
        f.result(timeout=1)


def test_cloned_overflow_raises_not_truncates(setup, tmp_path):
    """ref transcript + target text past the prefix bucket must raise a
    client-fixable ValueError: head-kept truncation would drop the
    TARGET tail while EOS pacing still budgets for it — wrong audio
    with no signal (round-3 review finding)."""
    cfg, params = setup
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32, params=params)
    V = cfg.code_predictor.group_vocab_size
    d = tmp_path / "pov"
    d.mkdir()
    codes = np.asarray(jax.random.randint(
        jax.random.PRNGKey(5), (6, 16), 0, V, jnp.int32))
    np.save(d / "ref_codec_tokens.npy", codes.astype(np.int64))
    # byte-fallback tokenizer: ~1 token/char; tiny cap = 64 text tokens
    (d / "ref_text.txt").write_text("r" * 100)
    with pytest.raises(ValueError, match="overflows the prefix"):
        eng.synthesize("target words here", language="english",
                       prompt_dir=str(d))
    # synthesize_long refuses up front: the transcript alone leaves no
    # room for any piece
    with pytest.raises(ValueError, match="too long for voice cloning"):
        eng.synthesize_long("target words here", language="english",
                            prompt_dir=str(d))


def test_cloned_overflow_rejected_by_daemon(setup, tmp_path):
    """The batched daemon surfaces the cloned-overflow error to the
    client (blob header + stream done-frame), for both the plain and
    --long batched paths."""
    import json

    from qwen3_tts_tpu.serve.batching import ContinuousBatcher
    from qwen3_tts_tpu.serve.daemon import TTSDaemon, decode_response

    cfg, params = setup
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32, params=params)
    V = cfg.code_predictor.group_vocab_size
    d = tmp_path / "pd"
    d.mkdir()
    codes = np.asarray(jax.random.randint(
        jax.random.PRNGKey(6), (6, 16), 0, V, jnp.int32))
    np.save(d / "ref_codec_tokens.npy", codes.astype(np.int64))
    (d / "ref_text.txt").write_text("q" * 100)

    batcher = ContinuousBatcher(cfg, params, batch_size=2, decode_chunk=4,
                                dtype=jnp.float32)
    daemon = TTSDaemon(eng, str(tmp_path / "t.sock"), batcher=batcher)
    # rejections return synchronously from handle() — no serve loop needed
    for extra in ({}, {"long": True}):
        req = json.dumps({"text": "target words", "prompt_dir": str(d),
                          **extra}).encode()
        resp = daemon.handle(req)
        header, _ = decode_response(resp)
        assert "error" in header, header
        assert ("overflows the prefix" in header["error"]
                or "too long for voice cloning" in header["error"])
        frames = []
        daemon.handle(json.dumps(
            {"text": "target words", "prompt_dir": str(d),
             "stream": True, **extra}).encode(), frames.append)
        hdr, _ = decode_response(frames[-1])
        assert hdr.get("done") and "error" in hdr


def test_cloned_long_batched_success(setup, tmp_path):
    """A fitting voice-cloned --long request through the batched daemon:
    pieces split under the ref-tightened budget, every piece decodes with
    the prompt conditioning, audio stitches in order (the restructured
    _handle_batched_long path, round-3 review)."""
    import json
    import os
    import threading
    import time

    from qwen3_tts_tpu.serve.batching import ContinuousBatcher
    from qwen3_tts_tpu.serve.daemon import DaemonClient, TTSDaemon

    cfg, params = setup
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32, params=params)
    V = cfg.code_predictor.group_vocab_size
    d = tmp_path / "plong"
    d.mkdir()
    codes = np.asarray(jax.random.randint(
        jax.random.PRNGKey(9), (6, 16), 0, V, jnp.int32))
    np.save(d / "ref_codec_tokens.npy", codes.astype(np.int64))
    (d / "ref_text.txt").write_text("refvoice")

    sock = str(tmp_path / "tts_cl.sock")
    batcher = ContinuousBatcher(cfg, params, batch_size=2, decode_chunk=4,
                                dtype=jnp.float32)
    daemon = TTSDaemon(eng, sock, batcher=batcher)
    t = threading.Thread(target=daemon.serve, daemon=True)
    t.start()
    while not os.path.exists(sock):
        time.sleep(0.05)
    try:
        cl = DaemonClient(sock)
        hdr, audio = cl.synthesize("Ab cd. Ef gh.", language="english",
                                   seed=3, long=True, prompt_dir=str(d))
        assert "error" not in hdr, hdr
        assert hdr["n_sentences"] >= 2
        assert hdr["n_tokens"] > 0
        assert len(audio) == hdr["n_samples"] == hdr["n_tokens"] * 1920
    finally:
        daemon.stop()
        t.join(timeout=10)
