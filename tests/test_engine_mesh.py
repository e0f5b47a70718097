"""Engine-tier mesh path (round-4 ADVICE): TTSEngine(mesh=...) — the
configuration `cli.py --tp N` builds — gets its own CPU-mesh coverage,
mirroring the batcher mesh tests in test_batching.py. The engine mesh is
tensor-parallel only (dp=1; dp batching belongs to ContinuousBatcher)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu import config as C
from qwen3_tts_tpu.engine.engine import TTSEngine
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.parallel import mesh as pmesh


def _mesh_cfg():
    talker = C.TalkerConfig(
        num_layers=2, hidden_size=64, intermediate_size=128,
        num_heads=8, num_kv_heads=4, head_dim=16,
        text_vocab_size=151936, text_embed_dim=32, codec_vocab_size=3072,
        max_seq_len=64)
    cp_cfg = C.CodePredictorConfig(
        num_layers=2, hidden_size=64, intermediate_size=128,
        num_heads=8, num_kv_heads=4, head_dim=16)
    return dataclasses.replace(C.tiny_tts_config(max_tokens=6),
                               talker=talker, code_predictor=cp_cfg)


@pytest.fixture(scope="module")
def setup():
    cfg = _mesh_cfg()
    params = weights_io.init_random_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


@pytest.mark.parametrize("quantize", [None, "int8-cp"])
def test_engine_synthesize_on_tp_mesh(setup, quantize):
    """TTSEngine over a tp=2 serving mesh synthesizes end-to-end
    (dense and int8-cp — the two quantize modes the mesh supports) and
    stays deterministic per seed."""
    cfg, params = setup
    mesh = pmesh.make_mesh(1, 2)
    with mesh:
        eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32,
                        params=dict(params), quantize=quantize, mesh=mesh)
        a = eng.synthesize("mesh engine", language="english", seed=3)
        b = eng.synthesize("mesh engine", language="english", seed=3)
    assert a.n_tokens > 0
    np.testing.assert_array_equal(a.codes, b.codes)
    assert len(a.audio_int16) == a.n_tokens * 1920


def test_engine_mesh_streaming_matches_blob(setup):
    """Streaming through the mesh engine equals the non-streaming codes
    (the head-chunk schedule rides the same sharded decode program)."""
    cfg, params = setup
    mesh = pmesh.make_mesh(1, 2)
    with mesh:
        eng = TTSEngine(cfg, model_dir=None, dtype=jnp.float32,
                        params=dict(params), mesh=mesh)
        a = eng.synthesize("stream on mesh", language="english", seed=5)
        b = eng.synthesize("stream on mesh", language="english", seed=5,
                           streaming=True)
    np.testing.assert_array_equal(a.codes, b.codes)


def test_engine_mesh_rejects_dp_and_int8(setup):
    """Guard rails: a dp>1 mesh and quantize='int8' (fused single-chip
    layout) are engine-tier misconfigurations, rejected loudly."""
    cfg, params = setup
    with pytest.raises(ValueError, match="dp=1"):
        TTSEngine(cfg, model_dir=None, dtype=jnp.float32,
                  params=dict(params), mesh=pmesh.make_mesh(2, 2))
    with pytest.raises(ValueError, match="int8-cp"):
        TTSEngine(cfg, model_dir=None, dtype=jnp.float32,
                  params=dict(params), quantize="int8",
                  mesh=pmesh.make_mesh(1, 2))
