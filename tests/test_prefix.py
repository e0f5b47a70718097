"""Dual-stream prefix construction parity (llamacpp_talker_server.py:121-161)."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu import config as C
from qwen3_tts_tpu.models import talker as tk

CFG = C.tiny_tts_config().talker


def _np_embed_text(p, ids):
    e = np.asarray(p["text_embedding"])[ids]
    h = e @ np.asarray(p["proj_fc1_w"]) + np.asarray(p["proj_fc1_b"])
    h = h / (1.0 + np.exp(-h))
    return h @ np.asarray(p["proj_fc2_w"]) + np.asarray(p["proj_fc2_b"])


def _np_build_prefix(p, text_ids):
    """Literal port of the reference layout."""
    ce = np.asarray(p["codec_embedding"])
    special = _np_embed_text(p, np.array(
        [C.TTS_PAD_TOKEN_ID, C.TTS_BOS_TOKEN_ID, C.TTS_EOS_TOKEN_ID]))
    tts_pad, tts_bos, tts_eos = special

    role = _np_embed_text(p, np.array(
        [C.IM_START_TOKEN_ID, C.ASSISTANT_TOKEN_ID, C.NEWLINE_TOKEN_ID]))
    think = np.stack([tts_pad] * 3) + ce[
        [C.CODEC_NOTHINK_ID, C.CODEC_THINK_BOS_ID, C.CODEC_THINK_EOS_ID]]
    transition = (tts_bos + ce[C.CODEC_PAD_ID])[None]
    text_e = _np_embed_text(p, np.asarray(text_ids))
    text_plus_eos = np.concatenate([text_e, tts_eos[None]], axis=0)
    dual_text = text_plus_eos + ce[C.CODEC_PAD_ID][None]
    final = (tts_pad + ce[C.CODEC_BOS_ID])[None]
    return np.concatenate([role, think, transition, dual_text, final], axis=0)


def test_prefix_matches_reference_layout():
    params = tk.init_talker_params(jax.random.PRNGKey(1), CFG)
    text_ids = [5, 17, 200, 3000, 42]
    want = _np_build_prefix(params, text_ids)

    n_pad = 8
    padded = np.zeros(n_pad, np.int32)
    padded[:len(text_ids)] = text_ids
    prefix, plen = tk.build_prefix(params, jnp.asarray(padded),
                                   jnp.int32(len(text_ids)))
    assert int(plen) == len(text_ids) + tk.PREFIX_EXTRA == want.shape[0]
    got = np.asarray(prefix)[:int(plen)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prefix_pad_region_is_zero_irrelevant():
    """Rows beyond prefix_len may be anything, but prefill masks them; here we
    just check the real rows don't depend on the pad content."""
    params = tk.init_talker_params(jax.random.PRNGKey(1), CFG)
    ids = np.zeros(8, np.int32)
    ids[:3] = [7, 8, 9]
    a, _ = tk.build_prefix(params, jnp.asarray(ids), jnp.int32(3))
    ids2 = ids.copy()
    ids2[3:] = 1234  # different pad garbage
    b, _ = tk.build_prefix(params, jnp.asarray(ids2), jnp.int32(3))
    np.testing.assert_allclose(np.asarray(a)[:12], np.asarray(b)[:12],
                               rtol=1e-6, atol=0)


def test_build_prefix_clamps_oversized_n_text():
    """n_text > N_pad (a caller bucketing bug) must not push the
    eos/final rows out of the tail region: it clamps to N_pad, keeping
    prefix_len consistent with the built rows."""
    tp = tk.init_talker_params(jax.random.PRNGKey(1), CFG)
    ids = jnp.arange(8, dtype=jnp.int32)
    good, good_len = tk.build_prefix(tp, ids, jnp.int32(8))
    bad, bad_len = tk.build_prefix(tp, ids, jnp.int32(11))
    assert int(bad_len) == int(good_len) == 8 + tk.PREFIX_EXTRA
    np.testing.assert_array_equal(np.asarray(bad), np.asarray(good))
