"""Weight-only int8 quantization tests: numerics, pallas/XLA parity,
end-to-end engine smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.ops import quant


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 96), scale=0.05).astype(np.float32)
    qt = quant.quantize_int8(jnp.asarray(w))
    assert qt.q.dtype == jnp.int8
    deq = np.asarray(quant.dequantize(qt, jnp.float32))
    # per-channel int8: max error <= scale/2 per element
    scales = np.asarray(qt.scale)
    assert (np.abs(deq - w) <= scales[None, :] * 0.5 + 1e-8).all()


def test_matmul_quant_close_to_dense():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64), scale=0.5).astype(np.float32)
    w = rng.normal(size=(64, 128), scale=0.05).astype(np.float32)
    dense = np.asarray(quant.matmul(jnp.asarray(x), jnp.asarray(w)))
    qt = quant.quantize_int8(jnp.asarray(w))
    qout = np.asarray(quant.matmul(jnp.asarray(x), qt, use_pallas=False))
    rel = np.abs(qout - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < 0.02, rel


def test_qtensor_indexing_and_scan_slicing():
    w = jnp.ones((3, 8, 16)) * jnp.arange(1, 4)[:, None, None]
    qt = quant.quantize_int8(w)
    q1 = qt[1]
    assert q1.q.shape == (8, 16) and q1.scale.shape == (16,)
    np.testing.assert_allclose(np.asarray(quant.dequantize(q1, jnp.float32)),
                               np.asarray(w[1]), rtol=1e-2)

    # lax.scan must slice QTensor leaves along the leading axis
    def body(c, qlayer):
        return c + quant.dequantize(qlayer, jnp.float32).sum(), None

    total, _ = jax.lax.scan(body, jnp.float32(0), qt)
    np.testing.assert_allclose(float(total), float(w.sum()), rtol=1e-2)


def test_qmatmul_pallas_interpret_matches_xla():
    """Pallas kernel (interpret mode on CPU) vs the XLA fallback."""
    from qwen3_tts_tpu.ops.pallas.qmatmul import qmatmul_pallas
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 1024), scale=0.5).astype(np.float32)
    w = rng.normal(size=(1024, 256), scale=0.05).astype(np.float32)
    qt = quant.quantize_int8(jnp.asarray(w))
    want = np.asarray(quant.matmul(jnp.asarray(x), qt, use_pallas=False))
    got = np.asarray(qmatmul_pallas(jnp.asarray(x), qt.q, qt.scale,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_quantized_decode_close_to_dense():
    """A quantized tiny talker decode step stays close to the dense one."""
    from qwen3_tts_tpu.config import tiny_tts_config
    from qwen3_tts_tpu.models import talker as tk
    from qwen3_tts_tpu.models import transformer as tfm

    cfg = tiny_tts_config().talker
    tp = tk.init_talker_params(jax.random.PRNGKey(0), cfg)
    tpq = quant.quantize_talker(tp)
    geo = tfm.geometry_of(cfg)
    kv = tfm.init_kv_cache(geo, 1, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.hidden_size)) * 0.3

    hd, _ = tk.decode_step(tp, x, jnp.array([0]), kv, cfg)
    hq, _ = tk.decode_step(tpq, x, jnp.array([0]), kv, cfg)
    cos = float(jnp.sum(hd * hq) /
                (jnp.linalg.norm(hd) * jnp.linalg.norm(hq) + 1e-9))
    assert cos > 0.999, cos


def test_engine_quantized_smoke():
    from qwen3_tts_tpu.config import tiny_tts_config
    from qwen3_tts_tpu.engine.engine import TTSEngine

    eng = TTSEngine(tiny_tts_config(max_tokens=6), model_dir=None,
                    dtype=jnp.float32, quantize="int8")
    res = eng.synthesize("hi", language="english", seed=0)
    assert res.n_tokens >= 0
    if res.n_tokens:
        assert (res.codes < 2048).all()
