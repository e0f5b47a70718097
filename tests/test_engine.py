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
