"""Chunked (block-wise) prefill must equal the one-shot prefill exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.models import talker as tk
from qwen3_tts_tpu.models import transformer as tfm

CFG = tiny_tts_config().talker


def _setup(n_text=12, n_pad=16):
    tp = tk.init_talker_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(np.arange(1, n_pad + 1, dtype=np.int32))
    prefix, plen = tk.build_prefix(tp, ids, jnp.int32(n_text))
    return tp, prefix[None], plen[None]


def test_chunked_matches_oneshot():
    tp, prefix, plen = _setup()
    geo = tfm.geometry_of(CFG)
    kv1 = tfm.init_kv_cache(geo, 1, CFG.max_seq_len)
    kv2 = tfm.init_kv_cache(geo, 1, CFG.max_seq_len)

    h1, kv1 = tk.prefill(tp, prefix, plen, kv1, CFG)
    h2, kv2 = tk.prefill_chunked(tp, prefix, plen, kv2, CFG, chunk=8)

    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-4)
    # KV for the real positions must match too
    P = int(plen[0])
    np.testing.assert_allclose(np.asarray(kv1[:, :, :, :P]),
                               np.asarray(kv2[:, :, :, :P]),
                               rtol=2e-4, atol=2e-4)


def test_chunked_then_decode_matches():
    """Decode steps after chunked prefill equal those after one-shot."""
    tp, prefix, plen = _setup(n_text=5, n_pad=8)
    geo = tfm.geometry_of(CFG)
    kv1 = tfm.init_kv_cache(geo, 1, CFG.max_seq_len)
    kv2 = tfm.init_kv_cache(geo, 1, CFG.max_seq_len)
    _, kv1 = tk.prefill(tp, prefix, plen, kv1, CFG)
    _, kv2 = tk.prefill_chunked(tp, prefix, plen, kv2, CFG, chunk=4)

    x = jax.random.normal(jax.random.PRNGKey(5), (1, CFG.hidden_size)) * 0.3
    pos = plen.astype(jnp.int32)
    h1, _ = tk.decode_step(tp, x, pos, kv1, CFG)
    h2, _ = tk.decode_step(tp, x, pos, kv2, CFG)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-4)


def test_chunk_not_dividing_length():
    """P not a multiple of chunk: zero-padding must not change the result."""
    tp, prefix, plen = _setup(n_text=4, n_pad=16)  # P_pad = 25
    geo = tfm.geometry_of(CFG)
    kv1 = tfm.init_kv_cache(geo, 1, CFG.max_seq_len)
    kv2 = tfm.init_kv_cache(geo, 1, CFG.max_seq_len)
    h1, _ = tk.prefill(tp, prefix, plen, kv1, CFG)
    h2, _ = tk.prefill_chunked(tp, prefix, plen, kv2, CFG, chunk=7)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-4)


def test_chunked_prefill_rejects_overflowing_window():
    """A chunk grid that would write past the KV capacity must fail
    loudly (the dynamic_update_slice clamp would otherwise silently
    overwrite real prefix KV at wrong RoPE positions)."""
    import pytest

    cfg = CFG
    tp = tk.init_talker_params(jax.random.PRNGKey(0), cfg)
    geo = tfm.geometry_of(cfg)
    S = cfg.max_seq_len
    kv = tfm.init_kv_cache(geo, 1, S, dtype=jnp.float32)
    P = S - 2  # pads to ceil(P/chunk)*chunk > S for chunk=100
    prefix = jnp.zeros((1, P, cfg.hidden_size), jnp.float32)
    with pytest.raises(ValueError, match="chunked prefill"):
        tk.prefill_chunked(tp, prefix, jnp.asarray([P - 1]), kv, cfg,
                           chunk=100)
