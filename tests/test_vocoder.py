"""Vocoder tests: shapes, FP32 policy, Snake math, chunked crossfade
contract. Numerical parity against the torch implementation lives in
tests/test_vocoder_golden.py."""

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


def test_snake_beta_matches_definition():
    """SnakeBeta := x + sin^2(x * e^a) / (e^b + 1e-9) — the decoder's
    activation (torch SnakeBeta module semantics)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 3)).astype(np.float32)
    a = rng.normal(size=3).astype(np.float32)
    b = rng.normal(size=3).astype(np.float32)
    got = np.asarray(voc.snake_beta(jnp.asarray(x), jnp.asarray(a),
                                    jnp.asarray(b)))
    want = x + np.sin(x * np.exp(a)) ** 2 / (np.exp(b) + 1e-9)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_causal_conv_is_causal():
    """Output at frame t must not see inputs after t (stride 1)."""
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(7, 1, 1)).astype(np.float32))
    b = jnp.zeros((1,))
    x = jnp.asarray(rng.normal(size=(1, 20, 1)).astype(np.float32))
    y1 = np.asarray(voc.causal_conv1d(x, w, b))
    x2 = x.at[0, 10, 0].set(99.0)
    y2 = np.asarray(voc.causal_conv1d(x2, w, b))
    assert y1.shape == (1, 20, 1)
    np.testing.assert_array_equal(y1[0, :10], y2[0, :10])
    assert not np.allclose(y1[0, 10:], y2[0, 10:])


def test_dilated_causal_conv_receptive_field():
    """dilation=9 conv (the op AX650N could not compile, README.md:61)
    must see inputs at offsets {0, -9, -18} only."""
    x = np.zeros((1, 64, 1), np.float32)
    x[0, 32, 0] = 1.0
    w = np.ones((3, 1, 1), np.float32)
    b = np.zeros((1,), np.float32)
    got = np.asarray(voc.causal_conv1d(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b), dilation=9))[0, :, 0]
    nz = np.nonzero(got)[0]
    assert set(nz.tolist()) == {32, 32 + 9, 32 + 18}


def test_trans_conv_upsamples():
    """Upsample-stage transposed conv (k == s) multiplies length exactly."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(2, 3, 3)).astype(np.float32))
    b = jnp.zeros((3,))
    x = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    y = voc.causal_trans_conv1d(x, w, b, stride=2)
    assert y.shape == (1, 10, 3)


def test_decode_shape_and_finite():
    params = voc.init_vocoder_params(jax.random.PRNGKey(0), CFG)
    codes = jax.random.randint(jax.random.PRNGKey(1), (1, 8, 16), 0, 2048)
    wav = voc.decode(params, codes, CFG)
    assert wav.shape == (1, 8 * SAMPLES_PER_TOKEN)
    assert wav.dtype == jnp.float32
    w = np.asarray(wav)
    assert np.isfinite(w).all()
    assert (np.abs(w) <= 1.0).all()  # clamp(-1, 1) output
    raw = voc.decode_raw(params, codes, CFG)
    assert raw.shape == (1, voc.out_len(CFG, 8))
    assert voc.out_len(CFG, 8) == 8 * CFG.total_upsample - CFG.output_crop


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
    chunk decodes outside overlaps and a linear blend inside
    (reference vocoder_server.py:101-117 semantics)."""
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


def test_chunked_context_lengths():
    """Left-context chunker emits exactly T*1920 samples for any T."""
    params = voc.init_vocoder_params(jax.random.PRNGKey(0), CFG)
    for T, chunk, ctx in ((3, 8, 4), (17, 8, 4), (16, 8, 25)):
        fn = jax.jit(lambda c: voc.decode(params, c, CFG))
        codes = np.random.default_rng(T).integers(
            0, 2048, (T, 16)).astype(np.int32)
        got = voc.synthesize_chunked_context(fn, codes, chunk_tokens=chunk,
                                             context_tokens=ctx)
        assert len(got) == T * SAMPLES_PER_TOKEN


def test_synthesize_exact_at_bucket_boundaries():
    """synthesize_exact must equal a full decode (>= 1 zero-code
    lookahead token) for every token count — INCLUDING counts that land
    exactly on a bucket boundary (64/128/256). A round-2 advisor finding:
    picking bucket == n left the tail ~output_crop samples decoding
    zero-padding (hard silence); the bucket must be strictly greater."""
    params = voc.init_vocoder_params(jax.random.PRNGKey(2), CFG)
    spt = SAMPLES_PER_TOKEN

    def decode_fn(buf):
        return voc.decode(params, jnp.asarray(buf), CFG)

    rng = np.random.default_rng(7)
    for T in (1, 63, 64, 65, 128, 255, 256):
        codes = rng.integers(0, 2048, (T, 16)).astype(np.int32)
        got = voc.synthesize_exact(decode_fn, codes)
        assert got.shape == (T * spt,)
        # reference: decode with explicit zero lookahead, no bucketing
        ref_buf = np.zeros((1, T + 2, 16), np.int32)
        ref_buf[0, :T] = codes
        want = np.asarray(decode_fn(ref_buf))[0][:T * spt]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"T={T}")


def test_synthesize_exact_long_fallback_matches_context_chunker():
    """Past max_single tokens synthesize_exact must route to the
    conv-exact left-context chunker (not crossfade blending)."""
    params = voc.init_vocoder_params(jax.random.PRNGKey(2), CFG)
    codes = np.random.default_rng(8).integers(
        0, 2048, (40, 16)).astype(np.int32)

    def decode_fn(buf):
        return voc.decode(params, jnp.asarray(buf), CFG)

    got = voc.synthesize_exact(decode_fn, codes, max_single=32)
    want = voc.synthesize_chunked_context(decode_fn, codes,
                                          voc.VOC_CHUNK_SIZE)
    np.testing.assert_array_equal(got, want)


def test_int16_clip():
    a = np.array([0.5, -2.0, 2.0], np.float32)
    out = voc.to_int16(a)
    assert out.dtype == np.int16
    assert out[1] == -32768 and out[2] == 32767
