"""Vocoder tests: shapes, FP32 policy, Snake math, chunked crossfade contract."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import SAMPLES_PER_TOKEN, tiny_tts_config
from qwen3_tts_tpu.models import vocoder as voc

CFG = tiny_tts_config().vocoder


def test_total_upsample_is_1920():
    assert CFG.total_upsample == 1920  # tts_client.py:30 contract


def test_snake_matches_definition():
    x = np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32)
    alpha = np.array([0.5, 1.0, 2.0], np.float32)
    got = np.asarray(voc.snake(jnp.asarray(x), jnp.asarray(alpha)))
    want = x + np.sin(alpha * x) ** 2 / (alpha + 1e-9)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv1d_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 9, 2)).astype(np.float32)
    w = rng.normal(size=(3, 2, 4)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    got = np.asarray(voc.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0)))
    want = np.zeros((1, 9, 4), np.float32)
    for t in range(9):
        want[0, t] = np.einsum("kc,kcd->d", xp[0, t:t + 3], w) + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dilated_conv_receptive_field():
    """dilation=9 conv (the op AX650N could not compile, README.md:62) must
    see exactly k_eff = (k-1)*9+1 inputs."""
    x = np.zeros((1, 64, 1), np.float32)
    x[0, 32, 0] = 1.0
    w = np.ones((3, 1, 1), np.float32)
    b = np.zeros((1,), np.float32)
    got = np.asarray(voc.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                dilation=9))[0, :, 0]
    nz = np.nonzero(got)[0]
    assert set(nz.tolist()) == {32 - 9, 32, 32 + 9}


def test_decode_shape_and_finite():
    params = voc.init_vocoder_params(jax.random.PRNGKey(0), CFG)
    codes = jax.random.randint(jax.random.PRNGKey(1), (1, 8, 16), 0, 2048)
    wav = voc.decode(params, codes, CFG)
    assert wav.shape == (1, 8 * SAMPLES_PER_TOKEN)
    assert wav.dtype == jnp.float32
    w = np.asarray(wav)
    assert np.isfinite(w).all()
    assert (np.abs(w) <= 1.0).all()  # tanh output


def test_chunked_single_equals_direct():
    params = voc.init_vocoder_params(jax.random.PRNGKey(0), CFG)
    fn = jax.jit(lambda c: voc.decode(params, c, CFG))
    codes = np.random.default_rng(2).integers(0, 2048, (5, 16)).astype(np.int32)
    got = voc.synthesize_chunked(fn, codes, max_tokens=8, overlap=2)
    padded = np.zeros((1, 8, 16), np.int32)
    padded[0, :5] = codes
    want = np.asarray(fn(padded))[0][:5 * SAMPLES_PER_TOKEN]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    assert len(got) == 5 * SAMPLES_PER_TOKEN


def test_chunked_multi_length_and_blend():
    """Multi-chunk output must be exactly T*1920 samples, equal to the
    chunk decodes outside overlaps and a linear blend inside."""
    params = voc.init_vocoder_params(jax.random.PRNGKey(0), CFG)
    fn = jax.jit(lambda c: voc.decode(params, c, CFG))
    T, MT, OV = 14, 8, 2
    codes = np.random.default_rng(3).integers(0, 2048, (T, 16)).astype(np.int32)
    got = voc.synthesize_chunked(fn, codes, max_tokens=MT, overlap=OV)
    assert len(got) == T * SAMPLES_PER_TOKEN

    def run(chunk):
        p = np.zeros((1, MT, 16), np.int32)
        p[0, :len(chunk)] = chunk
        return np.asarray(fn(p))[0][:len(chunk) * SAMPLES_PER_TOKEN]

    # chunks at starts 0, 6, 12 (step = 8-2 = 6)
    a = run(codes[0:8])
    b = run(codes[6:14])
    spt = SAMPLES_PER_TOKEN
    ovs = OV * spt
    # region before first overlap comes from chunk a
    np.testing.assert_allclose(got[:6 * spt], a[:6 * spt], rtol=1e-6)
    # blended region: linear fade between a-tail and b-head
    fade_out = np.linspace(1.0, 0.0, ovs, dtype=np.float32)
    want_blend = a[6 * spt:8 * spt] * fade_out + b[:ovs] * (1 - fade_out)
    np.testing.assert_allclose(got[6 * spt:8 * spt], want_blend,
                               rtol=1e-5, atol=1e-6)


def test_int16_clip():
    a = np.array([0.5, -2.0, 2.0], np.float32)
    out = voc.to_int16(a)
    assert out.dtype == np.int16
    assert out[1] == -32768 and out[2] == 32767
