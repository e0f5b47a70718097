"""Speech-tokenizer encoder tests: shapes, RVQ semantics, round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.models import encoder as enc
from qwen3_tts_tpu.models import vocoder as voc

TTS = tiny_tts_config()
ECFG = TTS.encoder


def test_encode_features_shape():
    p = enc.init_encoder_params(jax.random.PRNGKey(0), ECFG)
    wav = jnp.zeros((1, 1920 * 4))
    z = enc.encode_features(p, wav, ECFG)
    assert z.shape == (1, 4, ECFG.embed_dim)


def test_rvq_reduces_residual():
    """Each RVQ stage must not increase the residual norm (greedy argmin
    includes reconstruction monotonicity on random codebooks)."""
    key = jax.random.PRNGKey(1)
    D = 8
    cbs = jax.random.normal(key, (4, 32, D)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 6, D))
    codes = enc.rvq_encode(cbs, z)
    assert codes.shape == (1, 6, 4)
    # reconstruct and compare against stage-0-only reconstruction
    recon_full = sum(np.asarray(cbs[i])[np.asarray(codes)[0, :, i]]
                     for i in range(4))
    recon_one = np.asarray(cbs[0])[np.asarray(codes)[0, :, 0]]
    err_full = np.linalg.norm(np.asarray(z)[0] - recon_full)
    err_one = np.linalg.norm(np.asarray(z)[0] - recon_one)
    assert err_full <= err_one + 1e-5


def test_rvq_exact_recovery():
    """A latent equal to a sum of codebook rows must be recovered exactly
    when codebooks are near-orthogonal."""
    D = 16
    rng = np.random.default_rng(0)
    cbs = np.zeros((2, 8, D), np.float32)
    # stage 0 rows live in dims 0..7, stage 1 rows in dims 8..15
    cbs[0, :, :8] = rng.normal(size=(8, 8)) * 2
    cbs[1, :, 8:] = rng.normal(size=(8, 8)) * 2
    true0, true1 = 3, 5
    z = (cbs[0, true0] + cbs[1, true1])[None, None, :]
    codes = np.asarray(enc.rvq_encode(jnp.asarray(cbs), jnp.asarray(z)))
    assert codes[0, 0, 0] == true0
    assert codes[0, 0, 1] == true1


def test_encode_decode_roundtrip_shapes():
    """wav -> codes -> decoder -> wav of the same length."""
    ep = enc.init_encoder_params(jax.random.PRNGKey(0), ECFG)
    vp = voc.init_vocoder_params(jax.random.PRNGKey(1), TTS.vocoder)
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 1920 * 3)) * 0.1
    codes = enc.encode(ep, vp["codebooks"], wav, ECFG)
    assert codes.shape == (1, 3, 16)
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < ECFG.codebook_size).all()
    out = voc.decode(vp, codes, TTS.vocoder)
    assert out.shape == wav.shape


def test_resample_and_pad():
    wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    out = enc.resample_linear(wav, 16000, 24000)
    assert abs(len(out) - 24000) <= 1
    padded = enc.pad_to_tokens(out)
    assert len(padded) % 1920 == 0
