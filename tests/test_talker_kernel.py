"""Fused talker decode-step kernel (ops/pallas/talker_step.py): interpret
mode vs the XLA decode step on the same fused-int8 params."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.models import transformer as tfm
from qwen3_tts_tpu.ops import quant
from qwen3_tts_tpu.ops.pallas.talker_step import talker_decode_step_fused

GEO = tfm.TransformerGeometry(
    num_layers=2, hidden_size=256, intermediate_size=256,
    num_heads=2, num_kv_heads=1, head_dim=128,
    rms_norm_eps=1e-6, rope_theta=1e6)


def _setup(B, S, seed=0):
    params = tfm.init_stack_params(jax.random.PRNGKey(seed), GEO)
    fused = quant.quantize_layer_stack(params, fuse=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    x = jax.random.normal(k1, (B, GEO.hidden_size), jnp.float32) * 0.3
    kv = jax.random.normal(
        k2, (GEO.num_layers, 2, B, S, GEO.num_kv_heads, GEO.head_dim),
        jnp.float32) * 0.2
    pos = jax.random.randint(k3, (B,), 1, S - 1)
    return fused, x, kv, pos


def test_fused_step_matches_xla():
    B, S = 3, 32
    fused, x, kv, pos = _setup(B, S)
    want_h, want_kv = tfm.decode_step(fused, x, pos, kv, GEO)

    cos, sin = tfm.rope_cos_sin(jnp.arange(S, dtype=jnp.int32),
                                GEO.head_dim, GEO.rope_theta)
    got_h, got_kv = talker_decode_step_fused(
        fused, x, pos, kv, cos, sin, eps=GEO.rms_norm_eps, interpret=True)

    # bf16 cast points differ between the kernel and the XLA step, so
    # agreement is bf16-grade: tight relative on O(1) values, absolute
    # floor ~2 bf16 ulps for near-zero elements
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=5e-2, atol=2e-2)
    # the fresh K/V rows at pos[b] must match tightly (pre-softmax values)
    b_idx = np.arange(B)
    np.testing.assert_allclose(
        np.asarray(got_kv[:, :, b_idx, np.asarray(pos)]),
        np.asarray(want_kv[:, :, b_idx, np.asarray(pos)]),
        rtol=2e-2, atol=2e-2)
    # untouched rows unchanged
    mask = np.ones((B, S), bool)
    mask[b_idx, np.asarray(pos)] = False
    np.testing.assert_array_equal(
        np.asarray(got_kv)[:, :, mask], np.asarray(kv)[:, :, mask])


def test_fused_step_position_isolation():
    """Rows attend only to their own [0..pos[b]] prefix: changing rows
    past pos must not change the output."""
    B, S = 2, 32
    fused, x, kv, pos = _setup(B, S, seed=7)
    pos = jnp.array([5, 9], jnp.int32)
    cos, sin = tfm.rope_cos_sin(jnp.arange(S, dtype=jnp.int32),
                                GEO.head_dim, GEO.rope_theta)
    h1, _ = talker_decode_step_fused(
        fused, x, pos, kv, cos, sin, eps=GEO.rms_norm_eps, interpret=True)
    kv2 = kv.at[:, :, :, 12:].set(99.0)   # beyond both positions
    h2, _ = talker_decode_step_fused(
        fused, x, pos, kv2, cos, sin, eps=GEO.rms_norm_eps, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
