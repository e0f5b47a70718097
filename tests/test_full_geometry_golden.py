"""Full-geometry torch-golden parity (closes VERDICT r3 Weak #2).

Every other golden test runs ``tiny_tts_config()``; a geometry-dependent
misreading — RoPE theta=1e6 at head_dim 128 over 512 positions, per-head
QK-norm at 16/8 heads (GQA group 2), the real 3072-entry codec head —
would pass all of them.  This module pins the REAL deployment geometry
against ``transformers``' Qwen3Model:

- talker: 28 layers, hidden 1024, 16/8 heads, head_dim 128,
  rope_theta 1e6, n_ctx 512
  (/root/reference/scripts/extract_talker_as_qwen3.py:89-110), checked
  at positions near 0, near 128, and near 511 (prefill rows + 4 KV-cached
  decode steps ending at position 511);
- code predictor: 5 layers + small_to_mtp_projection, 15 groups x 2048
  (/root/reference/scripts/export_code_predictor_onnx.py:30-46), exact
  greedy 15-group recursion + group-1 logits parity;
- vocoder: the real ``VocoderConfig()`` deployment geometry (8L/1024
  pre-transformer with sliding_window 72, decoder_dim 1536, upsample
  (8,5,4,3)x(2,2) = 1920 samples/token — the decoder the reference
  traces in scripts/export_vocoder_traced.py:74-80), decoded PAST the
  sliding window so the real rope_theta 1e4 table, the 16x2048 codebook
  sum, and every channel-halving conv stage run at deployed size.

Only the *text-embedding gather surface* is shrunk (vocab 8): a gather is
geometry-insensitive, and the real 151936 x 2048 table costs 1.2 GB per
side without exercising anything the tiny-geometry prefix goldens don't.
Every transformer / codec-head / CP dimension is the deployed one.

Slow (~minutes on one CPU core, marked ``slow``); weights are generated
at sigma 0.02 so 28 layers of accumulated fp32 error stay within the same
rtol used by the tiny goldens.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from qwen3_tts_tpu import config as C
from qwen3_tts_tpu.config import SamplingConfig
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.models import code_predictor as cp
from qwen3_tts_tpu.models import talker as tk
from qwen3_tts_tpu.models import transformer as tfm

pytestmark = pytest.mark.slow

# Real geometry, tiny gather surface (see module docstring).
TK = dataclasses.replace(C.TalkerConfig(), text_vocab_size=8,
                         text_embed_dim=8)
CP = C.CodePredictorConfig()

RTOL, ATOL = 5e-4, 1e-4   # 28 fp32 layers accumulate ~2x the tiny error


def _full_qwen3(num_layers, seed):
    """torch Qwen3Model at the REAL geometry; weights sampled small and
    norm gains perturbed so parity failures can't hide behind identities
    or fp32 blow-up across 28 layers."""
    from transformers.models.qwen3 import Qwen3Config, Qwen3Model

    tc = Qwen3Config(
        vocab_size=8,  # unused: we always feed inputs_embeds
        hidden_size=TK.hidden_size,
        intermediate_size=TK.intermediate_size,
        num_hidden_layers=num_layers,
        num_attention_heads=TK.num_heads,
        num_key_value_heads=TK.num_kv_heads,
        head_dim=TK.head_dim,
        rms_norm_eps=TK.rms_norm_eps,
        rope_theta=TK.rope_theta,
        max_position_embeddings=TK.max_seq_len,
        attn_implementation="eager",
        use_cache=True,
    )
    torch.manual_seed(seed)
    m = Qwen3Model(tc)
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "norm" in name:   # RMSNorm gains: 1 + noise
                p.add_(0.05 * torch.randn(p.shape, generator=gen))
            else:                # projections: fresh small gaussians
                p.copy_(0.02 * torch.randn(p.shape, generator=gen))
    return m.eval()


@pytest.fixture(scope="module")
def golden():
    """(torch talker, torch cp, torch mtp, hf dict, jax tkp, jax cpp)."""
    talker_m = _full_qwen3(TK.num_layers, seed=0)
    cp_m = _full_qwen3(CP.num_layers, seed=100)
    torch.manual_seed(7)
    mtp = torch.nn.Linear(CP.hidden_size, CP.hidden_size).eval()

    rng = np.random.default_rng(0)

    def _rand(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02)

    hf = {}
    for k, v in talker_m.state_dict().items():
        hf[f"talker.model.{k}"] = v.numpy()
    for k, v in cp_m.state_dict().items():
        hf[f"talker.code_predictor.model.{k}"] = v.numpy()
    hf["talker.code_predictor.small_to_mtp_projection.weight"] = (
        mtp.weight.detach().numpy())
    hf["talker.code_predictor.small_to_mtp_projection.bias"] = (
        mtp.bias.detach().numpy())
    # minimal embedding surface (gather-only; see module docstring)
    hf["talker.model.text_embedding.weight"] = _rand(
        TK.text_vocab_size, TK.text_embed_dim)
    hf["talker.text_projection.linear_fc1.weight"] = _rand(
        TK.text_embed_dim, TK.text_embed_dim)
    hf["talker.text_projection.linear_fc1.bias"] = _rand(TK.text_embed_dim)
    hf["talker.text_projection.linear_fc2.weight"] = _rand(
        TK.hidden_size, TK.text_embed_dim)
    hf["talker.text_projection.linear_fc2.bias"] = _rand(TK.hidden_size)
    hf["talker.model.codec_embedding.weight"] = _rand(
        TK.codec_vocab_size, TK.hidden_size)
    hf["talker.codec_head.weight"] = _rand(
        TK.codec_vocab_size, TK.hidden_size)
    for g in range(CP.num_groups):
        hf[f"talker.code_predictor.model.codec_embedding.{g}.weight"] = (
            _rand(CP.group_vocab_size, CP.hidden_size))
        hf[f"talker.code_predictor.lm_head.{g}.weight"] = _rand(
            CP.group_vocab_size, CP.hidden_size)

    tkp = weights_io.load_talker_from_hf(hf, TK, dtype=jnp.float32)
    cpp = weights_io.load_code_predictor_from_hf(hf, CP, dtype=jnp.float32)
    return talker_m, cp_m, mtp, hf, tkp, cpp


def test_talker_full_geometry_prefill_and_decode_to_511(golden):
    """ONE 508-row prefill + 4 KV-cached decode steps ending at position
    511 (= max_seq_len - 1).  Prefill hidden is compared at rows near 0,
    near 128, and near the end; each decode step is compared against
    torch's KV-cached step.  Exercises the real RoPE table (theta 1e6,
    head_dim 128) across its full position range, per-head QK-norm at
    16/8 heads, and the 512-length causal mask edge."""
    from transformers import DynamicCache

    talker_m, _, _, _, tkp, _ = golden
    rng = np.random.default_rng(1)
    P = TK.max_seq_len - 4           # 508
    x = (rng.standard_normal((1, TK.max_seq_len, TK.hidden_size),
                             dtype=np.float32) * 0.3)

    cache = DynamicCache()
    with torch.no_grad():
        out = talker_m(inputs_embeds=torch.from_numpy(x[:, :P]),
                       past_key_values=cache, use_cache=True)
    want_prefill = out.last_hidden_state.numpy()

    geo = tfm.geometry_of(TK)
    kv = tfm.init_kv_cache(geo, 1, TK.max_seq_len)
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (1, P))
    mask = tfm.causal_mask(1, P, jnp.full((1,), P, jnp.int32))
    h, kv = tfm.forward_prefill(tkp["layers"], jnp.asarray(x[:, :P]),
                                positions, mask, geo, kv_cache=kv)
    got_prefill = np.asarray(
        tfm.rms_norm(h, tkp["final_norm"], TK.rms_norm_eps))

    rows = [0, 1, 127, 128, 129, P - 2, P - 1]
    np.testing.assert_allclose(got_prefill[:, rows], want_prefill[:, rows],
                               rtol=RTOL, atol=ATOL)

    for t in range(4):               # decode at positions 508..511
        with torch.no_grad():
            out = talker_m(
                inputs_embeds=torch.from_numpy(x[:, P + t:P + t + 1]),
                past_key_values=out.past_key_values, use_cache=True)
        want = out.last_hidden_state[:, -1].numpy()
        pos = jnp.full((1,), P + t, jnp.int32)
        got, kv = tk.decode_step(tkp, jnp.asarray(x[:, P + t]), pos, kv, TK)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=RTOL, atol=ATOL,
                                   err_msg=f"decode step at pos {P + t}")


def test_codec_logits_full_vocab(golden):
    """codec_head at the real 3072 vocab, incl. the masked-band edges the
    sampler relies on (llamacpp_talker_server.py:168-171)."""
    _, _, _, hf, tkp, _ = golden
    rng = np.random.default_rng(3)
    h = (rng.standard_normal((2, TK.hidden_size), dtype=np.float32) * 0.3)
    want = h @ hf["talker.codec_head.weight"].T
    got = np.asarray(tk.codec_logits(tkp, jnp.asarray(h)))
    assert got.shape == (2, 3072)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
    # the EOS row (2150) and both mask-band edges exist and are finite
    assert np.isfinite(got[:, [2047, 2048, 2150, 2151, 3071]]).all()


def test_cp_full_geometry_greedy_matches_torch(golden):
    """Greedy 15-group recursion at the real CP geometry: exact code
    agreement, plus numerical parity of the group-1 logits."""
    _, cp_m, mtp, hf, _, cpp = golden
    from transformers import DynamicCache

    rng = np.random.default_rng(5)
    hidden = (rng.standard_normal((1, CP.hidden_size),
                                  dtype=np.float32) * 0.3)
    code0_embed = (rng.standard_normal((1, CP.hidden_size),
                                       dtype=np.float32) * 0.3)

    def _core(embeds, past):
        with torch.no_grad():
            out = cp_m(inputs_embeds=mtp(embeds), past_key_values=past,
                       use_cache=True)
        return out.last_hidden_state, out.past_key_values

    heads = [hf[f"talker.code_predictor.lm_head.{g}.weight"]
             for g in range(CP.num_groups)]
    embs = [hf[f"talker.code_predictor.model.codec_embedding.{g}.weight"]
            for g in range(CP.num_groups)]
    past = DynamicCache()
    x2 = torch.from_numpy(np.stack([hidden[0], code0_embed[0]])[None])
    h, past = _core(x2, past)
    want_logits0 = h[0, -1].numpy() @ heads[0].T
    tok = int(np.argmax(want_logits0))
    want_codes = [tok]
    for step in range(1, CP.num_groups):
        e = torch.from_numpy(embs[step - 1][tok][None, None])
        h, past = _core(e, past)
        tok = int(np.argmax(h[0, -1].numpy() @ heads[step].T))
        want_codes.append(tok)

    scfg = SamplingConfig(cp_temperature=0.0)
    got = np.asarray(cp.predict_codes(
        cpp, jnp.asarray(hidden), jnp.asarray(code0_embed),
        jax.random.PRNGKey(0), CP, scfg))[0]
    assert got.tolist() == want_codes

    geo = tfm.geometry_of(CP)
    kv = tfm.init_kv_cache(geo, 1, CP.max_seq_len)
    x2j = jnp.asarray(np.stack([hidden[0], code0_embed[0]])[None])
    x2j = x2j @ cpp["mtp_proj_w"] + cpp["mtp_proj_b"]
    positions = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32), (1, 2))
    mask = tfm.causal_mask(1, 2, jnp.full((1,), 2, jnp.int32))
    hj, _ = tfm.forward_prefill(cpp["layers"], x2j, positions, mask, geo, kv)
    hj = tfm.rms_norm(hj, cpp["final_norm"], CP.rms_norm_eps)[:, -1]
    got_logits0 = np.asarray(hj @ cpp["lm_heads"][0])[0]
    np.testing.assert_allclose(got_logits0, want_logits0,
                               rtol=RTOL, atol=ATOL)


def test_vocoder_full_geometry_matches_torch():
    """The real vocoder geometry vs the public torch module, decoded at
    T=80 > sliding_window=72 so the deployed windowed-attention edge, the
    rope_theta=1e4 table, the 16-codebook embedding sum, and every
    channel-halving waveform stage (1536 -> ... at kernel 2*rate) run at
    deployment size.  The tiny-geometry goldens (test_vocoder_golden.py)
    cover the same contracts but would miss a geometry-dependent
    misreading (channel split points, kernel/stride pairing, head_dim 64
    rope)."""
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe \
        import Qwen3OmniMoeCode2WavConfig
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe \
        import Qwen3OmniMoeCode2Wav

    from qwen3_tts_tpu.models import vocoder as voc

    VC = C.VocoderConfig()            # the defaults ARE the real geometry
    assert VC.total_upsample == 1920  # the 12 Hz / 24 kHz contract
    tc = Qwen3OmniMoeCode2WavConfig(
        codebook_size=VC.codebook_size,
        hidden_size=VC.hidden_size,
        num_attention_heads=VC.num_attention_heads,
        num_key_value_heads=VC.num_key_value_heads,
        sliding_window=VC.sliding_window,
        intermediate_size=VC.intermediate_size,
        num_hidden_layers=VC.num_hidden_layers,
        num_quantizers=VC.num_codebooks,
        upsample_rates=list(VC.upsample_rates),
        upsampling_ratios=list(VC.upsampling_ratios),
        decoder_dim=VC.decoder_dim,
        rms_norm_eps=VC.rms_norm_eps,
        rope_theta=VC.rope_theta,
        layer_scale_initial_scale=VC.layer_scale_initial_scale,
        max_position_embeddings=256,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    m = Qwen3OmniMoeCode2Wav(tc)
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        # perturb every tensor so parity failures can't hide behind
        # zero-init identities (LayerScale, biases) — but RELATIVE to the
        # tensor's own init scale: a flat 0.05 (the tiny test's choice)
        # swamps the ~1/sqrt(fan_in) conv inits at these widths and
        # saturates the whole waveform to +-1, which makes the
        # comparison trivial and sign-flips boundary samples
        for p in m.parameters():
            s = float(p.std()) if p.numel() > 1 else 0.0
            s = s if s > 1e-6 else 0.02
            p.add_(0.3 * s * torch.randn(p.shape, generator=gen))
    m = m.eval()

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = weights_io.load_vocoder_from_state_dict(sd, VC)

    rng = np.random.default_rng(0)
    T = 80
    codes = rng.integers(0, VC.codebook_size, (1, T, 16)).astype(np.int32)
    with torch.no_grad():
        want = m(torch.from_numpy(codes).permute(0, 2, 1).long())
    want = want.squeeze(1).numpy()

    got = np.asarray(voc.decode_raw(params, jnp.asarray(codes), VC))
    assert got.shape == want.shape == (1, voc.out_len(VC, T))
    # the comparison only means something on a live waveform: a saturated
    # output (everything clamped to +-1) matches trivially and flips
    # sign at clamp boundaries under fp32 drift
    assert (np.abs(want) < 0.99).mean() > 0.5, "output saturated"
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_vocoder_stream_full_geometry_matches_decode():
    """The incremental streaming vocoder at the REAL geometry: its state
    shapes are geometry-derived (1536 -> 768 -> ... channel halving per
    waveform block, (k-1)*dilation tails at k=7, the 71-frame rolling KV
    window), and tests/test_vocoder_stream.py pins them at tiny geometry
    only.  Streams 80 frames (past sliding_window=72, so the KV window
    wraps at deployed size) in irregular chunks and demands the repo's
    streaming exactness contract against the full decode (float <= 1e-6
    abs; int16 within +-1 LSB on < 0.01% of samples)."""
    from qwen3_tts_tpu.models import vocoder as voc
    from qwen3_tts_tpu.models import vocoder_stream as vs

    VC = C.VocoderConfig()
    vp = voc.init_vocoder_params(jax.random.PRNGKey(0), VC)
    rng = np.random.default_rng(4)
    T = 80
    codes = rng.integers(0, VC.codebook_size, (T, 16)).astype(np.int32)

    state = vs.init_stream_state(VC)
    step = jax.jit(vs.stream_step, static_argnames=("cfg", "primed"))
    parts, at = [], 0
    for ci, csz in enumerate((13, 1, 31, 7, 28)):      # sums to 80
        x = jnp.asarray(codes[None, at:at + csz])
        audio, state = step(vp, state, x, VC, primed=ci > 0)
        parts.append(np.asarray(audio)[0])
        at += csz
    got = np.concatenate(parts)     # T*U - output_crop samples (lag)

    want = np.asarray(voc.decode_raw(vp, jnp.asarray(codes[None]), VC))[0]
    assert got.shape == want.shape  # out_len == T*U - output_crop
    np.testing.assert_allclose(got, want, rtol=0.0, atol=1e-6)
    gi = voc.to_int16(got).astype(np.int32)
    wi = voc.to_int16(want).astype(np.int32)
    delta = np.abs(gi - wi)
    assert delta.max() <= 1 and float((delta > 0).mean()) < 1e-4
