"""Speech-tokenizer encoder tests: shapes, RVQ semantics, round-trip,
strict mirror-named checkpoint loading."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.models import encoder as enc
from qwen3_tts_tpu.models import vocoder as voc

TTS = tiny_tts_config()
ECFG = TTS.encoder


def test_total_downsample_is_1920():
    assert ECFG.total_downsample == 1920


def test_encode_features_shape():
    p = enc.init_encoder_params(jax.random.PRNGKey(0), ECFG)
    wav = jnp.zeros((1, 1920 * 4))
    z = enc.encode_features(p, wav, ECFG)
    assert z.shape == (1, 4, ECFG.hidden_size)
    assert np.isfinite(np.asarray(z)).all()


def test_rvq_reduces_residual():
    """Each RVQ stage must not increase the residual norm (greedy argmin
    gives reconstruction monotonicity on random codebooks). The RVQ target
    is nq * z because the decoder reconstructs with the MEAN of the 16
    codebook rows (models/vocoder.decode_raw)."""
    key = jax.random.PRNGKey(1)
    D, NQ = 8, 4
    cbs = jax.random.normal(key, (NQ, 32, D)) * 0.5
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 6, D))
    codes = enc.rvq_encode(cbs, z)
    assert codes.shape == (1, 6, NQ)
    target = NQ * np.asarray(z)[0]
    recon_full = sum(np.asarray(cbs[i])[np.asarray(codes)[0, :, i]]
                     for i in range(NQ))
    recon_one = np.asarray(cbs[0])[np.asarray(codes)[0, :, 0]]
    err_full = np.linalg.norm(target - recon_full)
    err_one = np.linalg.norm(target - recon_one)
    assert err_full <= err_one + 1e-5


def test_rvq_exact_recovery():
    """A latent equal to the decoder-side MEAN of codebook rows must be
    recovered exactly when codebooks are near-orthogonal."""
    D = 16
    rng = np.random.default_rng(0)
    cbs = np.zeros((2, 8, D), np.float32)
    # stage 0 rows live in dims 0..7, stage 1 rows in dims 8..15
    cbs[0, :, :8] = rng.normal(size=(8, 8)) * 2
    cbs[1, :, 8:] = rng.normal(size=(8, 8)) * 2
    true0, true1 = 3, 5
    z = ((cbs[0, true0] + cbs[1, true1]) / 2)[None, None, :]
    codes = np.asarray(enc.rvq_encode(jnp.asarray(cbs), jnp.asarray(z)))
    assert codes[0, 0, 0] == true0
    assert codes[0, 0, 1] == true1


def test_encode_decode_roundtrip_shapes():
    """wav -> codes -> decoder -> wav of the same length, with codebooks
    sliced from the decoder's flat code_embedding."""
    ep = enc.init_encoder_params(jax.random.PRNGKey(0), ECFG)
    vp = voc.init_vocoder_params(jax.random.PRNGKey(1), TTS.vocoder)
    cbs = enc.decoder_codebooks(vp, TTS.vocoder)
    assert cbs.shape == (16, TTS.vocoder.codebook_size,
                         TTS.vocoder.hidden_size)
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 1920 * 3)) * 0.1
    codes = enc.encode(ep, cbs, wav, ECFG)
    assert codes.shape == (1, 3, 16)
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < ECFG.codebook_size).all()
    out = voc.decode(vp, codes, TTS.vocoder)
    assert out.shape == wav.shape


def test_encoder_loader_round_trip():
    """init -> mirror-named state dict -> strict loader -> identical
    params and identical encode output."""
    p = enc.init_encoder_params(jax.random.PRNGKey(3), ECFG)
    sd = _to_state_dict(p)
    p2 = enc.load_encoder_from_state_dict(sd, ECFG)
    wav = jax.random.normal(jax.random.PRNGKey(4), (1, 1920 * 2)) * 0.1
    a = np.asarray(enc.encode_features(p, wav, ECFG))
    b = np.asarray(enc.encode_features(p2, wav, ECFG))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    missing = dict(sd)
    missing.pop("encoder.0.conv.weight")
    with pytest.raises(KeyError):
        enc.load_encoder_from_state_dict(missing, ECFG)
    extra = dict(sd)
    extra["bogus"] = np.zeros(1, np.float32)
    with pytest.raises(ValueError):
        enc.load_encoder_from_state_dict(extra, ECFG)


def _to_state_dict(p):
    """Invert the encoder loader's mappings (test helper): JAX pytree ->
    torch-style mirror-named flat dict."""
    sd = {}

    def conv(w):  # (K, Cin/g, Cout) -> (Cout, Cin/g, K)
        return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))

    sd["encoder.0.conv.weight"] = conv(p["enc_in_w"])
    sd["encoder.0.conv.bias"] = np.asarray(p["enc_in_b"])
    n_blocks = len(ECFG.downsample_rates)
    for i in range(n_blocks):
        blk = p["blocks"][str(i)]
        d = f"encoder.{i + 1}.block."
        for d_i in range(3):
            r, u = d + f"{d_i}.", blk["res"][str(d_i)]
            sd[r + "act1.alpha"] = np.asarray(u["alpha1"])
            sd[r + "act1.beta"] = np.asarray(u["beta1"])
            sd[r + "conv1.conv.weight"] = conv(u["conv1_w"])
            sd[r + "conv1.conv.bias"] = np.asarray(u["conv1_b"])
            sd[r + "act2.alpha"] = np.asarray(u["alpha2"])
            sd[r + "act2.beta"] = np.asarray(u["beta2"])
            sd[r + "conv2.conv.weight"] = conv(u["conv2_w"])
            sd[r + "conv2.conv.bias"] = np.asarray(u["conv2_b"])
        sd[d + "3.alpha"] = np.asarray(blk["alpha"])
        sd[d + "3.beta"] = np.asarray(blk["beta"])
        sd[d + "4.conv.weight"] = conv(blk["down_w"])
        sd[d + "4.conv.bias"] = np.asarray(blk["down_b"])
    sd[f"encoder.{n_blocks + 1}.conv.weight"] = conv(p["enc_out_w"])
    sd[f"encoder.{n_blocks + 1}.conv.bias"] = np.asarray(p["enc_out_b"])
    for i in range(len(ECFG.downsampling_ratios)):
        st = p["downsample"][str(i)]
        u = f"downsample.{i}."
        sd[u + "0.dwconv.conv.weight"] = conv(st["cn_dw_w"])
        sd[u + "0.dwconv.conv.bias"] = np.asarray(st["cn_dw_b"])
        sd[u + "0.norm.weight"] = np.asarray(st["cn_ln_w"])
        sd[u + "0.norm.bias"] = np.asarray(st["cn_ln_b"])
        sd[u + "0.pwconv1.weight"] = np.asarray(st["cn_pw1_w"]).T
        sd[u + "0.pwconv1.bias"] = np.asarray(st["cn_pw1_b"])
        sd[u + "0.pwconv2.weight"] = np.asarray(st["cn_pw2_w"]).T
        sd[u + "0.pwconv2.bias"] = np.asarray(st["cn_pw2_b"])
        sd[u + "0.gamma"] = np.asarray(st["cn_gamma"])
        sd[u + "1.conv.weight"] = conv(st["down_w"])
        sd[u + "1.conv.bias"] = np.asarray(st["down_b"])
    lay = p["post"]["layers"]
    for i in range(ECFG.num_hidden_layers):
        pre = f"post_transformer.layers.{i}."
        sd[pre + "input_layernorm.weight"] = np.asarray(lay["input_ln"][i])
        sd[pre + "post_attention_layernorm.weight"] = \
            np.asarray(lay["post_ln"][i])
        for name, key in (("self_attn.q_proj", "q_proj"),
                          ("self_attn.k_proj", "k_proj"),
                          ("self_attn.v_proj", "v_proj"),
                          ("self_attn.o_proj", "o_proj"),
                          ("mlp.gate_proj", "gate_proj"),
                          ("mlp.up_proj", "up_proj"),
                          ("mlp.down_proj", "down_proj")):
            sd[pre + name + ".weight"] = np.asarray(lay[key][i]).T
        sd[pre + "self_attn_layer_scale.scale"] = \
            np.asarray(lay["attn_scale"][i])
        sd[pre + "mlp_layer_scale.scale"] = np.asarray(lay["mlp_scale"][i])
    sd["post_transformer.norm.weight"] = np.asarray(p["post"]["norm"])
    return sd


def test_resample_and_pad():
    wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    out = enc.resample_linear(wav, 16000, 24000)
    assert abs(len(out) - 24000) <= 1
    padded = enc.pad_to_tokens(out)
    assert len(padded) % 1920 == 0
