"""End-to-end engine tests (tiny geometry, CPU): text -> WAV."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import SAMPLE_RATE, SAMPLES_PER_TOKEN, tiny_tts_config
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.io import wav as wav_io


@pytest.fixture(scope="module")
def engine():
    return TTSEngine(tiny_tts_config(max_tokens=10), model_dir=None,
                     dtype=jnp.float32)


def test_synthesize_writes_wav(engine, tmp_path):
    out = str(tmp_path / "out.wav")
    res = engine.synthesize("hello world", language="english", output=out,
                            seed=0)
    assert res.n_tokens > 0
    assert len(res.audio_int16) == res.n_tokens * SAMPLES_PER_TOKEN
    assert os.path.exists(out)
    audio, sr = wav_io.read_wav(out)
    assert sr == SAMPLE_RATE
    assert len(audio) == len(res.audio_int16)


def test_synthesize_deterministic(engine):
    a = engine.synthesize("abc", language="english", seed=3)
    b = engine.synthesize("abc", language="english", seed=3)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.audio_int16, b.audio_int16)


def test_streaming_matches_nonstreaming_codes(engine):
    """Streaming and non-streaming must produce identical code streams for
    the same seed (same fused loop, chunked differently)."""
    a = engine.synthesize("abcdef", language="english", seed=5)
    b = engine.synthesize("abcdef", language="english", seed=5,
                          streaming=True)
    np.testing.assert_array_equal(a.codes, b.codes)
    # audio identical too: tiny runs fit in one vocoder chunk either way
    assert len(a.audio_int16) == len(b.audio_int16)


def test_language_validation(engine):
    with pytest.raises(ValueError):
        engine.synthesize("x", language="klingon")


def test_all_supported_languages_accepted(engine):
    from qwen3_tts_tpu.config import SUPPORTED_LANGUAGES
    for lang in SUPPORTED_LANGUAGES:
        res = engine.synthesize("ok", language=lang, seed=1)
        assert res.n_tokens >= 0  # accepted without error


def test_cli_tiny_smoke(tmp_path):
    from qwen3_tts_tpu.cli import main
    out = str(tmp_path / "cli.wav")
    rc = main(["hello", "--tiny", "--dtype", "float32", "--output", out,
               "--language", "english"])
    assert rc == 0
    assert os.path.exists(out)


def _assert_stream_contract(got, want):
    """models/vocoder_stream.py's wire contract: int16 within +-1 LSB on
    < 0.01% of samples (GEMM reassociation in the windowed attention)."""
    assert got.shape == want.shape
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 1, f"max {d.max()} LSB"
    assert (d > 0).mean() < 1e-4, f"{(d > 0).mean():.2%} samples differ"


def test_streaming_phase2_tail_windows():
    """Long utterance: the head schedule (8+56=64 tokens) doesn't cover it,
    so phase 2 finishes the decode in one invocation and the tail must be
    vocoded in disjoint windows — streaming must still equal non-streaming
    token-for-token and sample-for-sample in length."""
    import dataclasses

    cfg = dataclasses.replace(tiny_tts_config(max_tokens=80))
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32)
    # ~20 byte-fallback tokens: small prefix (fits the 128-position KV with
    # the 80-token budget), but enough that the EOS force (6x n_text) stays
    # beyond the budget, so the decode runs well past the 64-token head
    text = "thirty characters of test text"  # boost starts at 0.8*3*30=72
    a = eng.synthesize(text, language="english", seed=2)
    b = eng.synthesize(text, language="english", seed=2, streaming=True)
    assert a.n_tokens > sum(eng.head_schedule), (
        "test needs an utterance longer than the head schedule")
    np.testing.assert_array_equal(a.codes, b.codes)
    assert len(b.audio_int16) == b.n_tokens * SAMPLES_PER_TOKEN
    # DEFAULT engine streaming is the full-left-context window path:
    # BIT-exact vs the non-streaming decode (conv-exact, r2/r3; kept as
    # the default by the r5 A/B — it measured 6% faster than the
    # incremental path at engine scale, docs/BENCHMARKS.md)
    np.testing.assert_array_equal(a.audio_int16, b.audio_int16)
    # the opt-in incremental path (QWEN3_TTS_ENGINE_STREAM=incremental,
    # the batched tier's stream — r5, VERDICT r4 #8) equals the decode
    # within the stream contract: int16 never more than +-1 LSB off.
    # Measured here: 2 of 153,600 samples at 1 LSB.
    os.environ["QWEN3_TTS_ENGINE_STREAM"] = "incremental"
    try:
        inc = eng.synthesize(text, language="english", seed=2,
                             streaming=True)
    finally:
        os.environ.pop("QWEN3_TTS_ENGINE_STREAM", None)
    np.testing.assert_array_equal(inc.codes, a.codes)
    _assert_stream_contract(inc.audio_int16, a.audio_int16)


def test_streaming_chunks_concatenate_to_nonstreaming_audio():
    """The wire-visible on_chunk frames of a long utterance concatenate to
    exactly the non-streaming audio (chunk joins are invisible)."""
    cfg = tiny_tts_config(max_tokens=80)
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32)
    text = "thirty characters of test text"
    frames = []
    a = eng.synthesize(text, language="english", seed=2)
    b = eng.synthesize(text, language="english", seed=2, streaming=True,
                       on_chunk=frames.append)
    assert len(frames) >= 3  # head emissions + tail windows
    streamed = np.concatenate(frames)
    # chunk joins are invisible: frames concatenate to exactly the
    # streaming result, which (default window path) is bit-exact
    np.testing.assert_array_equal(streamed, b.audio_int16)
    np.testing.assert_array_equal(b.audio_int16, a.audio_int16)
    # and the opt-in incremental path's frames obey the stream contract
    os.environ["QWEN3_TTS_ENGINE_STREAM"] = "incremental"
    frames2 = []
    try:
        c = eng.synthesize(text, language="english", seed=2,
                           streaming=True, on_chunk=frames2.append)
    finally:
        os.environ.pop("QWEN3_TTS_ENGINE_STREAM", None)
    np.testing.assert_array_equal(np.concatenate(frames2), c.audio_int16)
    _assert_stream_contract(c.audio_int16, a.audio_int16)


def test_streaming_eos_inside_first_head_chunk():
    """VERDICT round-1 weak #5: when the utterance ends INSIDE the first
    head chunk, the optimistic emission vocodes a full budget window whose
    tail rows are zero codes — those rows must be trimmed everywhere a
    client can observe them: the on_chunk frames, the final audio, and the
    sample count must all reflect the true token count."""
    import dataclasses

    cfg = dataclasses.replace(tiny_tts_config(max_tokens=5))
    eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32)
    assert cfg.max_tokens < eng.head_schedule[0]

    frames = []
    a = eng.synthesize("hello", language="english", seed=7)
    b = eng.synthesize("hello", language="english", seed=7, streaming=True,
                       on_chunk=frames.append)
    np.testing.assert_array_equal(a.codes, b.codes)
    assert 0 < b.n_tokens <= cfg.max_tokens
    # the wire-visible frames cover exactly the true extent, no zero tail
    streamed = np.concatenate(frames)
    assert len(streamed) == b.n_tokens * SAMPLES_PER_TOKEN
    np.testing.assert_array_equal(streamed, b.audio_int16)
    np.testing.assert_array_equal(a.audio_int16, b.audio_int16)


def test_bucketed_vocoder_matches_chunked(engine):
    """The non-streaming single-invocation bucketed vocoder must produce
    the same audio as the chunked-context path for the same codes (it IS
    a full decode; chunking only truncates attention context, which at
    utterance scale <= context+chunk is exact)."""
    from qwen3_tts_tpu.config import VOC_CHUNK_SIZE
    from qwen3_tts_tpu.models import vocoder as voc
    import jax.numpy as jnp

    res = engine.synthesize("bucketed", language="english", seed=9)
    n = res.n_tokens
    assert 0 < n <= 256  # took the single-invocation path
    chunked = voc.synthesize_chunked_context(
        lambda ch: engine._voc_chunk(engine.params["vocoder"],
                                     jnp.asarray(ch)),
        res.codes, VOC_CHUNK_SIZE)
    np.testing.assert_array_equal(res.audio_int16,
                                  chunked[:n * SAMPLES_PER_TOKEN])


def test_overlong_text_truncates_instead_of_crashing(engine):
    """Text whose padded bucket + prefix overhead exceeds max_seq_len must
    be truncated (with a warning), not crash prefill with a shape error."""
    res = engine.synthesize("x" * 500, language="english", seed=0)
    assert res.n_tokens >= 0


def test_chained_voc_window_bounds():
    """Window sizing for the chained vocoder dispatch: n_text == 0
    disables EOS pacing (progress pinned to 0), so the window must cover
    the full budget — sizing from 6*0+2 would silently truncate audio
    (round-3 review finding). For n_text > 0 the pacing force bounds the
    decode at 6*n_text+1 tokens."""
    from qwen3_tts_tpu.engine.engine import _chained_voc_window
    from qwen3_tts_tpu.models.vocoder import voc_bucket

    assert _chained_voc_window(200, 0) == voc_bucket(201)
    assert _chained_voc_window(10, 0) == voc_bucket(11)
    assert _chained_voc_window(200, 5) == voc_bucket(33)   # 6*5+2+1
    assert _chained_voc_window(20, 50) == voc_bucket(21)   # budget-capped


def test_empty_text_synthesis(engine):
    """Zero text tokens: no EOS pacing at all — the decode may run to the
    full budget and the audio/token accounting must stay consistent."""
    res = engine.synthesize("", language="english", seed=0)
    assert len(res.audio_int16) == res.n_tokens * SAMPLES_PER_TOKEN


def test_pacing_bound_derives_from_sampling_config():
    """The window-sizing multiplier must come from SamplingConfig, not a
    hardcoded 6 — a non-default pacing policy (both fields are public
    config) would otherwise truncate the chained vocoder window (review
    finding)."""
    import dataclasses

    from qwen3_tts_tpu.config import SamplingConfig
    from qwen3_tts_tpu.engine.engine import _pacing_bound

    s = SamplingConfig()
    assert _pacing_bound(200, 5, s) == 32            # ceil(3*2.0*5)+2
    s4 = dataclasses.replace(s, expected_tokens_per_text_token=4)
    assert _pacing_bound(200, 5, s4) == 42           # ceil(4*2.0*5)+2
    assert _pacing_bound(200, 0, s4) == 200          # pacing disabled
    assert _pacing_bound(10, 50, s) == 10            # budget-capped
    assert _pacing_bound(200, 5) == 32               # default == reference


def test_synthesize_batch_empty_and_shared_timings(engine):
    """synthesize_batch([]) returns [] (not an internals error), and each
    row's timings include the vocoder stage with one shared total
    (results used to be built INSIDE the open timer stage — review
    finding)."""
    assert engine.synthesize_batch([]) == []
    res = engine.synthesize_batch(["ab", "cdef"],
                                  languages=["english", "english"])
    assert len(res) == 2
    for r in res:
        assert "vocoder" in r.timings and "decode" in r.timings
    assert res[0].total_seconds == res[1].total_seconds


def test_chained_gate_uses_window_not_budget(tmp_path):
    """A short text under a LARGE max_tokens config must keep the
    chained decode+vocoder fast path: the gate is the pacing-bound
    window (<= largest vocoder bucket), not budget_cap <= 256 (round-3
    review finding). Observable via the stage names: the chained path
    records one fused 'decode+vocoder' stage, the fallback separate
    'decode' and 'vocoder' stages."""
    eng = TTSEngine(tiny_tts_config(max_tokens=400), model_dir=None,
                    dtype=jnp.float32)
    res = eng.synthesize("hi", language="english", seed=0)
    assert res.n_tokens > 0
    assert "decode+vocoder" in res.timings, res.timings
    assert "vocoder" not in res.timings, res.timings
