"""int8 KV cache kernel (ops/pallas/kv_int8.py, the VERDICT-r4 #5 probe):
quantization contract + interpret-mode parity of the Pallas attention
against a plain-JAX reference over the dequantized cache."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.ops.pallas import kv_int8


def test_quantize_kv_rows_roundtrip():
    rows = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 32)) * 2.0
    q, s = kv_int8.quantize_kv_rows(rows)
    assert q.dtype == jnp.int8 and s.shape == (3, 5)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq - rows))
    # symmetric per-row int8: error bounded by scale/2 = max|row|/254
    bound = np.asarray(jnp.max(jnp.abs(rows), axis=-1) / 254.0 + 1e-7)
    assert (err <= bound[..., None] + 1e-6).all()


def test_quantize_zero_rows():
    q, s = kv_int8.quantize_kv_rows(jnp.zeros((2, 4, 16)))
    assert (np.asarray(q) == 0).all() and (np.asarray(s) == 0).all()


def _reference_attn(q, kq, ks, vq, vs, pos):
    """Plain-JAX GQA over the dequantized cache (the kernel's contract)."""
    B, Hq, Dh = q.shape
    Hkv, S = kq.shape[1], kq.shape[2]
    G = Hq // Hkv
    k = kq.astype(jnp.float32) * ks[..., None]      # (B, Hkv, S, Dh)
    v = vq.astype(jnp.float32) * vs[..., None]
    qg = q.astype(jnp.float32).reshape(B, Hkv, G, Dh)
    s = jnp.einsum("bhgd,bhsd->bhgs", qg, k) / np.sqrt(Dh)
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, v)
    return out.reshape(B, Hq * Dh)


def test_kernel_matches_reference_interpret():
    B, Hq, Hkv, Dh, S = 2, 4, 2, 8, 16
    key = jax.random.PRNGKey(1)
    ks_ = jax.random.split(key, 3)
    q = jax.random.normal(ks_[0], (B, Hq, Dh), jnp.float32)
    kf = jax.random.normal(ks_[1], (B, Hkv, S, Dh)) * 0.5
    vf = jax.random.normal(ks_[2], (B, Hkv, S, Dh)) * 0.5
    kq, ksc = kv_int8.quantize_kv_rows(kf)
    vq, vsc = kv_int8.quantize_kv_rows(vf)
    pos = jnp.array([5, 12], jnp.int32)

    got = kv_int8.decode_attention_kv_int8(q, kq, ksc, vq, vsc, pos,
                                           interpret=True)
    want = _reference_attn(q, kq, ksc, vq, vsc, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_respects_pos_mask_interpret():
    """Rows past pos must not leak: poisoning them changes nothing."""
    B, Hq, Hkv, Dh, S = 1, 2, 1, 8, 12
    q = jnp.ones((B, Hq, Dh), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, S, Dh))
    vf = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, S, Dh))
    pos = jnp.array([4], jnp.int32)

    def run(kf, vf):
        kq, ksc = kv_int8.quantize_kv_rows(kf)
        vq, vsc = kv_int8.quantize_kv_rows(vf)
        return np.asarray(kv_int8.decode_attention_kv_int8(
            q, kq, ksc, vq, vsc, pos, interpret=True))

    a = run(kf, vf)
    poison = kf.at[:, :, 5:].set(99.0), vf.at[:, :, 5:].set(-99.0)
    b = run(*poison)
    np.testing.assert_array_equal(a, b)
