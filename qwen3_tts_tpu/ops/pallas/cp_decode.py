"""Pallas TPU mega-kernel: the code predictor's 14-step inner AR loop with
all transformer weights resident in VMEM.

Why this kernel exists
----------------------
The code predictor is the reference's 86%-of-runtime bottleneck
(docs/ARCHITECTURE.md:104-107) and ours too, in byte terms: each talker
token triggers 1 prefill + 14 sequential decode steps through the 5-layer
CP (models/code_predictor.py), and XLA re-streams the full layer stack
from HBM on every step — ~15 x 75 MB (int8) = 1.1 GB per talker token.
The weights, however, fit in VMEM when int8-quantized (75 MB < 128 MB),
so the speed-of-light program reads them ONCE and runs all 14 steps
on-chip. That is what this kernel does:

- grid = (14,): one grid step per AR step (steps 1..14 of the reference's
  dual_npu/code_predictor_server.py:127-140 semantics);
- the 5-layer int8 weight stack uses constant index_maps — Pallas fetches
  those blocks once and revisits them on every grid step;
- the per-step codec embedding table and lm_head use grid-indexed blocks
  (codec_embs[i], lm_heads[i+1]) that double-buffer in behind compute;
- the KV cache (L x 2 x 8 x nKV x S x Dh ~ 5 MB f32) lives in VMEM
  scratch, carried across grid steps; the sampled tokens carry in a
  VMEM (8, 128) scratch tile;
- sampling (top-k=50 + temperature categorical —
  code_predictor_server.py:87-92) runs in-kernel, vectorized per batch
  row: the top-k threshold via a 32-step bitwise binary search on the
  sortable-int transform of the float bits (topk_keep_mask — exact, and
  ~3x fewer VPU passes than (k-1) max-extractions at k=50), then
  Gumbel-max over the masked, scaled logits (exactly a categorical draw
  over the top-k softmax) with a counter-based hash PRNG (murmur-style
  finalizer; identical bits on TPU and in interpret mode — pltpu.prng_*
  has no interpret support).

Batch support: 1 <= B <= 8. All row-parallel math runs on a fixed 8-row
tile (one native sublane tile — the MXU cost of 8 rows equals 1); only
the per-(batch, head) attention loops scale with the true B. This serves
both the B=1 CLI path and the continuous-batching tier (the batched XLA
scan re-streams CP weights 14x per token even at batch 4).

Greedy mode (``temperature=0``) compiles WITHOUT the PRNG ops and takes
pure argmax — bit-comparable to the XLA scan at temperature 0, which is
what the parity tests check (sampled draws can't match across different
PRNG constructions).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_tts_tpu.ops.pallas.common import qmm as _qmm
from qwen3_tts_tpu.ops.pallas.common import rms as _rms
from qwen3_tts_tpu.ops.pallas.common import rot_mat as _rot_mat
from qwen3_tts_tpu.ops.pallas.common import NEG
BP = 8  # padded batch rows (one sublane tile)


def topk_keep_mask(logits, k):
    """Per-row mask ``logits >= (k-th largest value in the row)`` — the
    top-k keep set with ties kept, exactly what (k-1) max-extractions
    followed by ``logits >= max(rest)`` produces, but via a 32-step
    bitwise binary search for the threshold.

    The search runs on the order-preserving integer transform of the
    float bits (sign-flip trick: negative floats bit-reverse, positives
    offset above them), so the found threshold is the EXACT k-th largest
    representable value — no epsilon, identical keep set. Cost is 32
    compare+count passes over (N, V) instead of ~3*(k-1) passes for the
    extraction loop (~3x fewer VPU ops at k=50; measured in-kernel A/B in
    docs/BENCHMARKS.md)."""
    N, _ = logits.shape
    bits = jax.lax.bitcast_convert_type(logits, jnp.uint32)
    flip = jnp.where(bits >> 31 > 0, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    key = bits ^ flip                      # monotone in the float value

    def probe(b, t):
        cand = t | jax.lax.shift_right_logical(
            jnp.uint32(0x80000000), jnp.uint32(b))
        cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=-1,
                      keepdims=True)
        return jnp.where(cnt >= k, cand, t)

    thr = jax.lax.fori_loop(0, 32, probe,
                            jnp.zeros((N, 1), jnp.uint32))
    return key >= thr


def sample_tokens(logits, seed_col, step, *, top_k, temperature, greedy):
    """The kernel's sampling math as a standalone pure-jnp function —
    top-k keep set via bitwise threshold search (topk_keep_mask),
    counter-based hash PRNG (murmur3-finalizer style), Gumbel-max over
    the masked scaled logits (exactly a categorical draw over the top-k
    softmax; code_predictor_server.py:87-92 semantics).

    The kernel body calls THIS function, so the χ²-distribution tests in
    tests/test_cp_kernel.py exercise the very code the TPU compiles
    (biased bits or a wrong temperature scale would fail there).

    logits: (N, V) f32; seed_col: (N, 1) int32 per-row seeds; step:
    scalar int (the grid index — decorrelates successive AR steps).
    Returns (N, 1) int32.
    """
    N, V = logits.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, V), 1)

    if greedy:
        # the global argmax is always inside the top-k: skip the
        # threshold search entirely (bit-parity with the XLA oracle's
        # first-index argmax is preserved)
        z = logits
    else:
        keep = topk_keep_mask(logits, top_k)
        masked = jnp.where(keep, logits, NEG)
        # Counter-based hash PRNG in plain vector ops, distinct per
        # (row seed, step, lane). Row identity comes from the PER-ROW
        # seed — not the row index — so a request's draws are invariant
        # to its slot position and batch size (the engine/batcher parity
        # contract).
        bits = (seed_col.astype(jnp.uint32) * jnp.uint32(2654435761)
                + jnp.uint32(step).astype(jnp.uint32) * jnp.uint32(40503)
                + iota.astype(jnp.uint32) * jnp.uint32(2246822519))
        bits = bits ^ (bits >> 16)
        bits = bits * jnp.uint32(2246822519)
        bits = bits ^ (bits >> 13)
        bits = bits * jnp.uint32(3266489917)
        bits = bits ^ (bits >> 16)
        # u in (0, 1): 23 high bits as mantissa-grade uniform, nudged
        # off both endpoints so -log(-log(u)) stays finite; the int32
        # detour is lossless (Mosaic has no uint32->f32 cast)
        u = (bits >> 9).astype(jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 23))
        u = u * (1.0 - 1e-6) + 1e-7
        gumbel = -jnp.log(-jnp.log(u))
        z = jnp.where(keep, masked * (1.0 / max(temperature, 1e-6))
                      + gumbel, NEG)

    zm = jnp.max(z, axis=-1, keepdims=True)
    return jnp.min(jnp.where(z == zm, iota, V), axis=-1,
                   keepdims=True).astype(jnp.int32)


def _make_kernel(B, L, nH, nKV, S, V, eps, top_k, temperature, greedy):
    G = nH // nKV

    def kernel(seeds_pad,                     # (BP, 128) i32 per-row seeds
               tok0_pad,                      # (BP, 128) i32 initial tokens
               rope_cos, rope_sin,            # (S, Dh) f32
               q_q, q_s, k_q, k_s, v_q, v_s, o_q, o_s,
               g_q, g_s, u_q, u_s, d_q, d_s,  # int8 stacks + scales
               input_ln, post_ln, qn_w, kn_w, final_norm,
               mtp_w, mtp_b,                  # bf16 (H, H), f32 (1, H)
               kv_in,                         # (L, 2, BP, nKV, S, Dh) f32
               emb_blk,                       # (1, V, H) bf16: codec_embs[i]
               head_q, head_s,                # (1, H, V) int8, (1, 1, V) f32
               out_tok,                       # (1, BP, 128) i32 per step
               kv_scr, tok_scr):              # scratch
        i = pl.program_id(0)
        Dh = rope_cos.shape[-1]

        @pl.when(i == 0)
        def _init():
            kv_scr[...] = kv_in[...]
            tok_scr[...] = tok0_pad[...]

        tok_col = tok_scr[:, 0:1]             # (BP, 1) i32
        p = i + 2                             # write position (prefill = 0,1)

        # --- embed previous tokens + small_to_mtp projection ---
        # (dynamic row gathers at unaligned sublane offsets aren't
        # expressible in Mosaic; a one-hot MXU contraction is — and a
        # (BP,V)x(V,H) dot is ~16 MMACs, noise here)
        col = jax.lax.broadcasted_iota(jnp.int32, (BP, V), 1)
        onehot = (col == tok_col).astype(jnp.bfloat16)
        emb = jnp.dot(onehot, emb_blk[0],
                      preferred_element_type=jnp.float32)  # (BP, H)
        x = jnp.dot(emb.astype(jnp.bfloat16), mtp_w[...],
                    preferred_element_type=jnp.float32)
        x = (x + mtp_b[...].astype(jnp.float32)).astype(jnp.bfloat16)

        rot = _rot_mat(Dh)
        # rope row p via masked reduction (same alignment constraint)
        prow = (jax.lax.broadcasted_iota(jnp.int32, (S, Dh), 0) == p)
        cos = jnp.sum(jnp.where(prow, rope_cos[...], 0.0), axis=0,
                      keepdims=True)          # (1, Dh) f32
        sin = jnp.sum(jnp.where(prow, rope_sin[...], 0.0), axis=0,
                      keepdims=True)

        scale = 1.0 / (Dh ** 0.5)
        kmask = (jax.lax.broadcasted_iota(jnp.int32, (G, S), 1) <= p)
        for l in range(L):
            hn = _rms(x, input_ln[l], eps).astype(jnp.bfloat16)  # (BP, H)
            # (BP*nH, Dh) rows: b-major, head-minor — one 2D tile, no 3D
            q = _qmm(hn, q_q[l], q_s[l]).reshape(BP * nH, Dh)
            k = _qmm(hn, k_q[l], k_s[l]).reshape(BP * nKV, Dh)
            v = _qmm(hn, v_q[l], v_s[l]).reshape(BP * nKV, Dh)
            # per-head QK-RMSNorm then RoPE (HF Qwen3Attention order)
            q = _rms(q, qn_w[l], eps)
            k = _rms(k, kn_w[l], eps)
            q = q * cos + jnp.dot(q, rot,
                                  preferred_element_type=jnp.float32) * sin
            k = k * cos + jnp.dot(k, rot,
                                  preferred_element_type=jnp.float32) * sin

            # write K/V at position p; attend over [0..p] — loops over the
            # true batch rows and kv heads only
            outs = []
            for b in range(B):
                for h in range(nKV):
                    r = b * nKV + h
                    # masked RMW of the whole (S, Dh) tile: unaligned-
                    # sublane stores aren't expressible in Mosaic and the
                    # tile is only S x Dh
                    kh = jnp.where(prow, k[r:r + 1, :],
                                   kv_scr[l, 0, b, h, :, :])
                    vh = jnp.where(prow, v[r:r + 1, :],
                                   kv_scr[l, 1, b, h, :, :])
                    kv_scr[l, 0, b, h, :, :] = kh
                    kv_scr[l, 1, b, h, :, :] = vh
                    qh = q[b * nH + h * G:b * nH + (h + 1) * G, :]  # (G, Dh)
                    sc = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale  # (G, S)
                    sc = jnp.where(kmask, sc, NEG)
                    sc = sc - jnp.max(sc, axis=-1, keepdims=True)
                    e = jnp.exp(sc)
                    pb = e / jnp.sum(e, axis=-1, keepdims=True)
                    outs.append(jnp.dot(pb, vh,
                                        preferred_element_type=jnp.float32))
            attn = jnp.concatenate(outs, axis=0)       # (B*nH, Dh) f32
            if B < BP:
                attn = jnp.concatenate(
                    [attn, jnp.zeros(((BP - B) * nH, Dh), jnp.float32)],
                    axis=0)
            attn = attn.reshape(BP, nH * Dh).astype(jnp.bfloat16)
            x = x + _qmm(attn, o_q[l], o_s[l]).astype(jnp.bfloat16)

            hn = _rms(x, post_ln[l], eps).astype(jnp.bfloat16)
            g = _qmm(hn, g_q[l], g_s[l])
            u = _qmm(hn, u_q[l], u_s[l])
            act = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
            x = x + _qmm(act, d_q[l], d_s[l]).astype(jnp.bfloat16)

        hn = _rms(x, final_norm[...], eps).astype(jnp.bfloat16)
        logits = _qmm(hn, head_q[0], head_s[0])        # (BP, V) f32

        # top-k threshold + hash-PRNG Gumbel-max (see sample_tokens —
        # shared with the distribution tests)
        new_tok = sample_tokens(logits, seeds_pad[:, 0:1], i,
                                top_k=top_k, temperature=temperature,
                                greedy=greedy)         # (BP, 1)
        tiled = jnp.broadcast_to(new_tok, (BP, 128))
        tok_scr[...] = tiled
        out_tok[0, :, :] = tiled

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("eps", "top_k", "temperature", "greedy", "interpret"))
def cp_decode_steps(
    params: Dict,              # quantized CP params (ops/quant.py layout)
    tok0: jax.Array,           # () or (B,) int32 group-1 code(s)
    kv: jax.Array,             # (L, 2, B, S, nKV, Dh) post-prefill cache
    rope_cos: jax.Array,       # (S, Dh) f32
    rope_sin: jax.Array,
    seed: jax.Array,           # () or (B,) int32 per-element PRNG seeds
    *,
    eps: float,
    top_k: int,
    temperature: float,
    greedy: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Run CP AR steps 1..14 in one Pallas program. Returns (14,) int32
    for scalar ``tok0`` or (14, B) for vector ``tok0`` (codec groups
    2..15; group 1 is ``tok0``, sampled by the caller from lm_head_0
    after the 2-token prefill — code_predictor_server.py:127)."""
    from qwen3_tts_tpu.ops.quant import QTensor

    layers = params["layers"]
    heads: QTensor = params["lm_heads"]
    embs = params["codec_embs"]
    L, H, QD = layers["q_proj"].shape
    KVD = layers["k_proj"].shape[-1]
    Dh = layers["q_norm"].shape[-1]
    nH, nKV = QD // Dh, KVD // Dh
    S = kv.shape[3]
    V = embs.shape[1]
    n_steps = embs.shape[0] - 1               # 14

    seed = jnp.asarray(seed)
    scalar_tok = tok0.ndim == 0
    tok0v = tok0.reshape(-1).astype(jnp.int32)
    B = kv.shape[2]
    assert tok0v.shape[0] == B and B <= BP, (tok0.shape, kv.shape)

    # KV layout for the kernel: (L, 2, BP, nKV, S, Dh)
    kv_k = jnp.transpose(kv, (0, 1, 2, 4, 3, 5)).astype(jnp.float32)
    if B < BP:
        kv_k = jnp.pad(kv_k, ((0, 0), (0, 0), (0, BP - B),
                              (0, 0), (0, 0), (0, 0)))
    tok0_pad = jnp.zeros((BP, 128), jnp.int32).at[:B, :].set(
        jnp.broadcast_to(tok0v[:, None], (B, 128)))
    seedv = jnp.broadcast_to(seed.astype(jnp.int32).reshape(-1), (B,)) \
        if seed.ndim == 0 else seed.astype(jnp.int32)
    assert seedv.shape == (B,), (seed.shape, B)
    seeds_pad = jnp.zeros((BP, 128), jnp.int32).at[:B, :].set(
        jnp.broadcast_to(seedv[:, None], (B, 128)))

    kern = _make_kernel(B, L, nH, nKV, S, V, eps, top_k, temperature,
                        greedy)

    def inv(a):  # grid-invariant whole-array block
        return pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n,
                            memory_space=pltpu.VMEM)

    def lw(name):
        t: QTensor = layers[name]
        return t.q, t.scale.astype(jnp.float32)

    q_q, q_s = lw("q_proj")
    k_q, k_s = lw("k_proj")
    v_q, v_s = lw("v_proj")
    o_q, o_s = lw("o_proj")
    g_q, g_s = lw("gate_proj")
    u_q, u_s = lw("up_proj")
    d_q, d_s = lw("down_proj")

    operands = [
        seeds_pad,
        tok0_pad,
        rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32),
        q_q, q_s, k_q, k_s, v_q, v_s, o_q, o_s,
        g_q, g_s, u_q, u_s, d_q, d_s,
        layers["input_ln"].astype(jnp.float32),
        layers["post_ln"].astype(jnp.float32),
        layers["q_norm"].astype(jnp.float32),
        layers["k_norm"].astype(jnp.float32),
        params["final_norm"].astype(jnp.float32).reshape(1, H),
        params["mtp_proj_w"].astype(jnp.bfloat16),
        params["mtp_proj_b"].astype(jnp.float32).reshape(1, H),
        kv_k,
        embs.astype(jnp.bfloat16),
        heads.q,
        heads.scale.astype(jnp.float32)[:, None, :],   # (G, 1, V)
    ]

    in_specs = [inv(a) for a in operands[:-3]]
    in_specs += [
        pl.BlockSpec((1, V, H), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),            # codec_embs[i]
        pl.BlockSpec((1, H, V), lambda i: (i + 1, 0, 0),
                     memory_space=pltpu.VMEM),            # lm_heads[i+1]
        pl.BlockSpec((1, 1, V), lambda i: (i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    toks = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BP, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, BP, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L, 2, BP, nKV, S, Dh), jnp.float32),
            pltpu.VMEM((BP, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    if scalar_tok:
        return toks[:, 0, 0]
    return toks[:, :B, 0]
