"""Golden-value parity: JAX vocoder vs the public torch implementation.

The reference traces ``Qwen3TTSTokenizerV2Model.decoder``
(scripts/export_vocoder_traced.py:74-80). The public sibling of that module
is ``Qwen3OmniMoeCode2Wav`` (transformers), whose default geometry matches
every documented Qwen3-TTS contract (16x2048 codes, 1920x upsample, Snake,
dilation 1/3/9, causal convs). These tests run the actual torch module at a
tiny geometry and demand numerical parity from our JAX port, plus strict
tensor-name-keyed loading through the safetensors path a real
``speech_tokenizer/`` checkpoint would take.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.models import vocoder as voc

CFG = tiny_tts_config().vocoder


def _torch_model():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav,
    )

    tc = Qwen3OmniMoeCode2WavConfig(
        codebook_size=CFG.codebook_size,
        hidden_size=CFG.hidden_size,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        sliding_window=CFG.sliding_window,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_quantizers=CFG.num_codebooks,
        upsample_rates=list(CFG.upsample_rates),
        upsampling_ratios=list(CFG.upsampling_ratios),
        decoder_dim=CFG.decoder_dim,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        layer_scale_initial_scale=CFG.layer_scale_initial_scale,
        max_position_embeddings=256,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    m = Qwen3OmniMoeCode2Wav(tc)
    # random init leaves LayerScale/gamma at ~0 and snakes linear; perturb
    # every tensor so parity failures can't hide behind zeros
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
    return m.eval()


@pytest.fixture(scope="module")
def torch_and_jax():
    m = _torch_model()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = weights_io.load_vocoder_from_state_dict(sd, CFG)
    return m, params


def _torch_decode(m, codes_bt16: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        wav = m(torch.from_numpy(codes_bt16).permute(0, 2, 1).long())
    return wav.squeeze(1).numpy()


def test_decode_matches_torch(torch_and_jax):
    """T > sliding_window so the windowed attention mask is exercised."""
    m, params = torch_and_jax
    rng = np.random.default_rng(0)
    codes = rng.integers(0, CFG.codebook_size, (2, 12, 16)).astype(np.int32)
    want = _torch_decode(m, codes)
    got = np.asarray(voc.decode_raw(params, jnp.asarray(codes), CFG))
    assert got.shape == want.shape == (2, voc.out_len(CFG, 12))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-5)


def test_out_len_matches_torch(torch_and_jax):
    m, params = torch_and_jax
    for T in (1, 5):
        codes = np.zeros((1, T, 16), np.int32)
        want = _torch_decode(m, codes)
        assert want.shape[-1] == voc.out_len(CFG, T) \
            == T * CFG.total_upsample - CFG.output_crop


def test_sliding_window_matters(torch_and_jax):
    """Sanity: with T far beyond the window, early codes must NOT affect
    late audio through attention — and both impls agree on that boundary."""
    m, params = torch_and_jax
    rng = np.random.default_rng(1)
    codes = rng.integers(0, CFG.codebook_size, (1, 24, 16)).astype(np.int32)
    codes2 = codes.copy()
    codes2[0, 0] = (codes2[0, 0] + 7) % CFG.codebook_size
    a = np.asarray(voc.decode_raw(params, jnp.asarray(codes), CFG))
    b = np.asarray(voc.decode_raw(params, jnp.asarray(codes2), CFG))
    # influence of token 0 ends after window + conv receptive tail; the
    # final token's samples are identical
    spt = CFG.total_upsample
    assert np.allclose(a[0, -spt:], b[0, -spt:], atol=1e-6)
    assert not np.allclose(a[0, :spt], b[0, :spt], atol=1e-6)


def test_chunked_context_exact_with_full_context(torch_and_jax):
    """With context >= sequence length every chunk decodes a full prefix,
    so left-context + one-token-lookahead chunking must be sample-exact
    against a full decode (validates the lookahead/crop arithmetic)."""
    _, params = torch_and_jax
    rng = np.random.default_rng(2)
    T, chunk = 21, 6
    codes = rng.integers(0, CFG.codebook_size, (T, 16)).astype(np.int32)

    fn = jax.jit(lambda c: voc.decode(params, c, CFG))
    got = voc.synthesize_chunked_context(fn, codes, chunk_tokens=chunk,
                                         context_tokens=T)
    assert len(got) == T * CFG.total_upsample

    full = np.asarray(voc.decode_raw(
        params, jnp.asarray(codes[None]), CFG))[0]
    n_exact = len(full)  # full decode covers all but the final crop
    np.testing.assert_allclose(got[:n_exact], full, rtol=1e-6, atol=1e-7)
    # the final output_crop samples come from decoding the buffer's padded
    # zero-codes as lookahead — defined, finite, and continuous
    assert np.isfinite(got[n_exact:]).all()


def test_chunked_context_near_exact_bounded(torch_and_jax):
    """At a bounded left context (the production setting, mirroring torch
    chunked_decode's context 25 < window 72), the only error is the
    attention-context truncation — bounded at ~1e-4."""
    _, params = torch_and_jax
    rng = np.random.default_rng(4)
    T, chunk, ctx = 21, 6, 4
    codes = rng.integers(0, CFG.codebook_size, (T, 16)).astype(np.int32)

    fn = jax.jit(lambda c: voc.decode(params, c, CFG))
    got = voc.synthesize_chunked_context(fn, codes, chunk_tokens=chunk,
                                         context_tokens=ctx)
    full = np.asarray(voc.decode_raw(
        params, jnp.asarray(codes[None]), CFG))[0]
    np.testing.assert_allclose(got[:len(full)], full, atol=1e-4)


def test_loader_is_strict(torch_and_jax):
    m, _ = torch_and_jax
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    missing = dict(sd)
    missing.pop("decoder.0.conv.weight")
    with pytest.raises(KeyError, match="decoder.0.conv.weight"):
        weights_io.load_vocoder_from_state_dict(missing, CFG)
    extra = dict(sd)
    extra["sine_gen.phase"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="did not consume"):
        weights_io.load_vocoder_from_state_dict(extra, CFG)


def test_speech_tokenizer_safetensors_path(tmp_path, torch_and_jax):
    """End-to-end: a speech_tokenizer/model.safetensors with the real
    ``decoder.``-prefixed tensor names loads and decodes to parity."""
    from safetensors.numpy import save_file

    m, _ = torch_and_jax
    sd = {"decoder." + k: v.numpy() for k, v in m.state_dict().items()}
    st_dir = tmp_path / "speech_tokenizer"
    st_dir.mkdir()
    save_file(sd, str(st_dir / "model.safetensors"))

    cfg = tiny_tts_config()
    loaded = weights_io.load_speech_tokenizer(str(st_dir), cfg)
    codes = np.random.default_rng(3).integers(
        0, CFG.codebook_size, (1, 4, 16)).astype(np.int32)
    want = _torch_decode(m, codes)
    got = np.asarray(voc.decode_raw(loaded["vocoder"], jnp.asarray(codes),
                                    CFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-5)
