"""Prefix-state reuse: in-memory LRU and disk persistence (reference KV
cache semantics, llamacpp_talker_server.py:208-246)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.engine.engine import TTSEngine


@pytest.fixture(scope="module")
def engine():
    return TTSEngine(tiny_tts_config(max_tokens=6), model_dir=None,
                     dtype=jnp.float32)


def test_memory_cache_hit_same_output(engine):
    engine._prefix_cache.clear()
    a = engine.synthesize("repeat me", language="english", seed=9)
    assert len(engine._prefix_cache) == 1
    b = engine.synthesize("repeat me", language="english", seed=9)  # hit
    np.testing.assert_array_equal(a.codes, b.codes)


def test_lru_eviction(engine):
    engine._prefix_cache.clear()
    for i in range(engine._prefix_cache_cap + 2):
        engine.synthesize(f"text {i}", language="english", seed=0)
    assert len(engine._prefix_cache) == engine._prefix_cache_cap


def test_disk_persistence_roundtrip(engine, tmp_path):
    engine.kv_cache_dir = str(tmp_path)
    try:
        engine._prefix_cache.clear()
        a = engine.synthesize("disk cached", language="english", seed=4)
        files = [f for f in os.listdir(tmp_path) if f.startswith("qwen3_kv_")]
        assert len(files) == 1

        # cold start: new in-memory cache, must restore from disk and
        # produce the identical stream
        engine._prefix_cache.clear()
        b = engine.synthesize("disk cached", language="english", seed=4)
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.audio_int16, b.audio_int16)
    finally:
        engine.kv_cache_dir = None


def test_corrupt_disk_entry_falls_back(engine, tmp_path):
    engine.kv_cache_dir = str(tmp_path)
    try:
        engine._prefix_cache.clear()
        engine.synthesize("corrupt me", language="english", seed=1)
        files = [f for f in os.listdir(tmp_path) if f.startswith("qwen3_kv_")]
        with open(os.path.join(tmp_path, files[0]), "wb") as f:
            f.write(b"garbage")
        engine._prefix_cache.clear()
        res = engine.synthesize("corrupt me", language="english", seed=1)
        assert res.n_tokens >= 0  # recomputed, no crash
    finally:
        engine.kv_cache_dir = None


def test_pre_budget_disk_cache_format_loads(engine, tmp_path):
    """Disk snapshots written before GenState grew the per-slot `budget`
    field must still restore (budget defaults to cfg.max_tokens)."""
    engine.kv_cache_dir = str(tmp_path)
    try:
        engine._prefix_cache.clear()
        a = engine.synthesize("legacy fmt", language="english", seed=6)
        files = [f for f in os.listdir(tmp_path)
                 if f.startswith("qwen3_kv_")]
        assert len(files) == 1
        path = os.path.join(str(tmp_path), files[0])
        data = dict(np.load(path))
        assert "budget" in data
        data.pop("budget")   # simulate a pre-budget snapshot
        np.savez(path, **data)
        engine._prefix_cache.clear()
        b = engine.synthesize("legacy fmt", language="english", seed=6)
        np.testing.assert_array_equal(a.codes, b.codes)
    finally:
        engine.kv_cache_dir = None
