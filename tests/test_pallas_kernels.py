"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.models import transformer as tfm
from qwen3_tts_tpu.ops.pallas.decode_attention import decode_attention_pallas


def test_decode_attention_matches_xla():
    B, Hq, Hkv, Dh, S = 2, 4, 2, 128, 64
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, Hq, Dh)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, Dh)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, Dh)).astype(np.float32)
    pos = np.array([5, 33], np.int32)

    geo = tfm.TransformerGeometry(1, 64, 64, Hq, Hkv, Dh, 1e-6, 1e6)
    mask = (np.arange(S)[None, :] <= pos[:, None])[:, None, :]  # (B,1,S)
    want = np.asarray(tfm.gqa_attention(
        jnp.asarray(q)[:, None], jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mask), geo))[:, 0]

    got = np.asarray(decode_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode_attention_respects_position_bound():
    """Keys beyond pos must have zero influence."""
    B, Hq, Hkv, Dh, S = 1, 2, 1, 128, 32
    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, Hq, Dh)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, Dh)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, Dh)).astype(np.float32)
    pos = np.array([7], np.int32)

    a = np.asarray(decode_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        interpret=True))
    k2, v2 = k.copy(), v.copy()
    k2[:, 8:] = 99.0
    v2[:, 8:] = -99.0
    b = np.asarray(decode_attention_pallas(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(pos),
        interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_decode_step_pallas_geometry_flag():
    """decode_step with attn_impl='pallas' (interpret via CPU fallback is
    not available inside the layer scan, so force interpret by monkeypatch)
    must equal the XLA path."""
    import qwen3_tts_tpu.ops.pallas.decode_attention as da

    geo_x = tfm.TransformerGeometry(2, 64, 96, 4, 2, 128, 1e-6, 1e6,
                                    attn_impl="xla")
    geo_p = dataclasses.replace(geo_x, attn_impl="pallas")
    params = tfm.init_stack_params(jax.random.PRNGKey(0), geo_x)
    kv = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 1, 32, 2, 128)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64)) * 0.3
    pos = jnp.array([9], jnp.int32)

    want, want_kv = tfm.decode_step(params, x, pos, kv, geo_x)

    orig = da.decode_attention_pallas
    da_interp = lambda q, k, v, p, interpret=False: orig(q, k, v, p,
                                                         interpret=True)
    da.decode_attention_pallas = da_interp
    try:
        got, got_kv = tfm.decode_step(params, x, pos, kv, geo_p)
    finally:
        da.decode_attention_pallas = orig

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_kv), np.asarray(want_kv),
                               rtol=1e-5, atol=1e-5)
