"""Fused decode-loop tests: structure, determinism, EOS bounds, and parity
with an unfused python-level loop using the same key discipline."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu import config as C
from qwen3_tts_tpu.engine import generate as gen
from qwen3_tts_tpu.models import code_predictor as cp
from qwen3_tts_tpu.models import talker as tk
from qwen3_tts_tpu.models import transformer as tfm
from qwen3_tts_tpu.ops import sampling as smp

TTS = C.tiny_tts_config(max_tokens=12)


def _setup(seed=0):
    tp = tk.init_talker_params(jax.random.PRNGKey(1), TTS.talker)
    cpp = cp.init_cp_params(jax.random.PRNGKey(2), TTS.code_predictor)
    ids = jnp.asarray(np.array([10, 20, 30, 40, 50, 0, 0, 0], np.int32))
    n_text = jnp.int32(5)
    prefix, plen = tk.build_prefix(tp, ids, n_text)
    return tp, cpp, prefix[None], plen[None], n_text[None]


def test_generate_shapes_and_validity():
    tp, cpp, prefix, plen, n_text = _setup()
    codes, n_codes = gen.generate(tp, cpp, prefix, plen, n_text,
                                  jax.random.PRNGKey(7), TTS)
    assert codes.shape == (1, TTS.max_tokens, 16)
    n = int(n_codes[0])
    assert 0 <= n <= TTS.max_tokens
    c = np.asarray(codes[0])
    # generated rows: code_0 in [0,2048), groups in [0,2048)
    assert (c[:n] >= 0).all() and (c[:n] < 2048).all()
    # rows beyond n_codes stay zero
    assert (c[n:] == 0).all()


def test_generate_deterministic():
    tp, cpp, prefix, plen, n_text = _setup()
    a = gen.generate(tp, cpp, prefix, plen, n_text, jax.random.PRNGKey(3), TTS)
    b = gen.generate(tp, cpp, prefix, plen, n_text, jax.random.PRNGKey(3), TTS)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert int(a[1][0]) == int(b[1][0])


def test_generate_matches_unfused_loop():
    """Replay the loop at python level with the same model fns and the same
    PRNG split discipline; token streams must match exactly."""
    tp, cpp, prefix, plen, n_text = _setup()
    key = jax.random.PRNGKey(11)
    codes_f, n_f = gen.generate(tp, cpp, prefix, plen, n_text, key, TTS)

    # unfused replay
    tcfg, ccfg, scfg = TTS.talker, TTS.code_predictor, TTS.sampling
    geo = tfm.geometry_of(tcfg)
    kv = tfm.init_kv_cache(geo, 1, tcfg.max_seq_len)
    hidden, kv = tk.prefill(tp, prefix, plen, kv, tcfg)
    tts_pad = tk.embed_text(tp, jnp.array([C.TTS_PAD_TOKEN_ID]))[0]
    ring = jnp.full((1, scfg.repetition_window), -1, jnp.int32)
    pos = plen.astype(jnp.int32)
    k = key
    out = []
    for step in range(TTS.max_tokens):
        # per-element key discipline: split(key_i, 3) -> [next, c0, cp]
        k, k_c0, k_cp = jax.random.split(k, 3)
        logits = tk.codec_logits(tp, hidden)
        code0 = smp.sample_code0(logits[0], ring[0], jnp.int32(step),
                                 n_text[0], k_c0, scfg)
        if int(code0) == C.CODEC_EOS_ID or int(code0) >= 2048:
            break
        c0e = tp["codec_embedding"][code0][None]
        groups = cp.predict_codes(cpp, hidden, c0e, k_cp, ccfg, scfg)
        fb = (c0e[0] + jnp.sum(
            cpp["codec_embs"][jnp.arange(15), groups[0]], axis=0) + tts_pad)
        hidden, kv = tk.decode_step(tp, fb[None], pos, kv, tcfg)
        ring = jax.vmap(smp.ring_push)(ring, code0[None])
        pos = pos + 1
        out.append([int(code0)] + [int(x) for x in groups[0]])

    assert len(out) == int(n_f[0])
    np.testing.assert_array_equal(np.asarray(codes_f[0][:len(out)]),
                                  np.array(out, np.int32))


def test_force_eos_bound():
    """progress > 2.0 forces EOS: with n_text=1 the loop must stop within
    ~6 tokens + 1 regardless of logits (llamacpp_talker_server.py:179-180)."""
    tp, cpp, prefix, plen, _ = _setup()
    n_text = jnp.asarray([1], jnp.int32)
    _, n_codes = gen.generate(tp, cpp, prefix, plen, n_text,
                              jax.random.PRNGKey(0), TTS)
    assert int(n_codes[0]) <= 7


def test_generate_batched_matches_single():
    """Lockstep batched decode == independent batch-1 decode, per element.

    PRNG keys are per element (GenState.key is (B, 2)), so a request's
    samples depend only on ITS key — never on batch size or slot position.
    Two identical requests with the same broadcast key produce identical
    streams, both equal to the batch-1 run (VERDICT round-1 item 5)."""
    tp, cpp, prefix, plen, n_text = _setup()
    key = jax.random.PRNGKey(5)
    codes1, n1 = gen.generate(tp, cpp, prefix, plen, n_text, key, TTS)

    prefix2 = jnp.concatenate([prefix, prefix], axis=0)
    plen2 = jnp.concatenate([plen, plen])
    n_text2 = jnp.concatenate([n_text, n_text])
    codes2, n2 = gen.generate(tp, cpp, prefix2, plen2, n_text2, key, TTS)

    assert int(n2[0]) == int(n2[1]) == int(n1[0])
    np.testing.assert_array_equal(np.asarray(codes2[0]),
                                  np.asarray(codes2[1]))
    np.testing.assert_array_equal(np.asarray(codes2[0]),
                                  np.asarray(codes1[0]))


def test_generate_batched_distinct_keys():
    """Distinct per-element keys give distinct (but valid) streams."""
    tp, cpp, prefix, plen, n_text = _setup()
    prefix2 = jnp.concatenate([prefix, prefix], axis=0)
    plen2 = jnp.concatenate([plen, plen])
    n_text2 = jnp.concatenate([n_text, n_text])
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    codes, n = gen.generate(tp, cpp, prefix2, plen2, n_text2, keys, TTS)
    assert codes.shape[0] == 2
    for b in range(2):
        nb = int(n[b])
        cb = np.asarray(codes[b])
        assert (cb[:nb] < 2048).all() and (cb[nb:] == 0).all()
