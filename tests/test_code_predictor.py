"""Code-predictor parity: the fused scan must match a step-by-step NumPy
re-execution of the reference algorithm (code_predictor_server.py:94-140)
when driven with the same sampled tokens."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.config import tiny_tts_config
from qwen3_tts_tpu.models import code_predictor as cp
from qwen3_tts_tpu.models import transformer as tfm

import np_reference as ref

TTS = tiny_tts_config()
CFG = TTS.code_predictor
SCFG = TTS.sampling


def _np_cp_hidden(params, inputs):
    """Full-sequence forward through the CP core (mtp_proj -> layers -> norm)."""
    x = np.asarray(inputs, np.float32)
    x = x @ np.asarray(params["mtp_proj_w"]) + np.asarray(params["mtp_proj_b"])
    geo_d = dict(num_heads=CFG.num_heads, num_kv_heads=CFG.num_kv_heads,
                 head_dim=CFG.head_dim, rms_norm_eps=CFG.rms_norm_eps,
                 rope_theta=CFG.rope_theta)
    np_layers = {k: np.asarray(v) for k, v in params["layers"].items()}
    h = ref.stack_forward(np_layers, x, np.arange(len(x)), geo_d)
    return ref.rms_norm(h, np.asarray(params["final_norm"]), CFG.rms_norm_eps)


def test_predict_codes_shapes_and_range():
    params = cp.init_cp_params(jax.random.PRNGKey(0), CFG)
    B = 2
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, CFG.hidden_size))
    c0e = jax.random.normal(jax.random.PRNGKey(2), (B, CFG.hidden_size))
    codes = cp.predict_codes(params, hidden, c0e, jax.random.PRNGKey(3),
                             CFG, SCFG)
    assert codes.shape == (B, CFG.num_groups)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < CFG.group_vocab_size).all()


def test_cp_matches_numpy_teacher_forced():
    """Run the fused CP once, then replay the *same* token choices through the
    NumPy full-sequence forward: every step's logits-argmax context must match,
    i.e. hidden states agree along the sampled trajectory."""
    params = cp.init_cp_params(jax.random.PRNGKey(0), CFG)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.hidden_size)) * 0.5
    c0e = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.hidden_size)) * 0.5
    codes = np.asarray(cp.predict_codes(params, hidden, c0e,
                                        jax.random.PRNGKey(3), CFG, SCFG))[0]

    # NumPy replay: inputs = [hidden, code0_embed, emb_0[c1], emb_1[c2], ...]
    inputs = [np.asarray(hidden[0]), np.asarray(c0e[0])]
    for step in range(1, CFG.num_groups):
        emb_table = np.asarray(params["codec_embs"][step - 1])
        inputs.append(emb_table[codes[step - 1]])
    h_all = _np_cp_hidden(params, np.stack(inputs))

    # JAX hidden at prefill (pos 1) must match numpy row 1; check the logits
    # that produced each sampled code rank the sampled code identically.
    for step in range(CFG.num_groups):
        head = np.asarray(params["lm_heads"][step])
        logits_np = h_all[step + 1] @ head
        # the chosen token must be inside the numpy top-k of the same logits
        topk = np.argsort(logits_np)[-SCFG.cp_top_k:]
        assert codes[step] in topk, f"group {step}"


def test_cp_hidden_parity_exact():
    """Directly compare the fused prefill+scan hiddens with NumPy by using a
    deterministic variant (temperature ~ 0 ⇒ argmax) so trajectories align."""
    import dataclasses
    scfg = dataclasses.replace(SCFG, cp_temperature=1e-6, cp_top_k=1)
    params = cp.init_cp_params(jax.random.PRNGKey(0), CFG)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.hidden_size)) * 0.5
    c0e = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.hidden_size)) * 0.5
    codes = np.asarray(cp.predict_codes(params, hidden, c0e,
                                        jax.random.PRNGKey(3), CFG, scfg))[0]

    inputs = [np.asarray(hidden[0]), np.asarray(c0e[0])]
    np_codes = []
    for step in range(CFG.num_groups):
        h_all = _np_cp_hidden(params, np.stack(inputs))
        logits = h_all[step + 1] @ np.asarray(params["lm_heads"][step])
        tok = int(np.argmax(logits))
        np_codes.append(tok)
        if step + 1 < CFG.num_groups:
            inputs.append(np.asarray(params["codec_embs"][step])[tok])

    assert np_codes == codes.tolist()
