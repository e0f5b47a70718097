"""Pallas TPU kernel: the whole talker decode step as ONE program.

Why: the unrolled XLA decode step issues ~112 Pallas matmul launches plus
interleaved norm/rope/attention XLA ops per token; measured 1.08 ms
against a ~0.61 ms HBM floor (440 MB int8 weights + 58 MB KV reads at
B=1). The per-call pipeline ramp and the XLA ops between kernels cannot
overlap weight streaming across layer boundaries. Here the step is one
``pallas_call`` with ``grid=(L,)``: layer ``i``'s weight blocks stream in
via grid-indexed index_maps (double-buffered behind layer ``i-1``'s
compute), and norms/rope/attention run in-kernel, so the weight stream
never stalls.

Attention avoids per-head KV slicing (the state keeps the XLA-friendly
(L, 2, B, S, Hkv, Dh) layout, whose per-head (S, Dh) views are strided):
the KV block is reshaped to (S*Hkv, Dh) — a legal leading-dim merge —
and ALL heads attend in two full-width MXU dots per batch row,
(nH, Dh) x (Dh, S*Hkv) and (nH, S*Hkv) x (S*Hkv, Dh), with a mask
selecting each query head's kv-head column group. The masked-out MACs
are noise on the MXU (~16 M MACs/layer/row).

The current token's K/V rows are substituted into the block in-register
(the cache row at ``pos`` is stale) and also returned as a per-layer
output; the caller scatters them into the cache with one XLA scatter —
the kernel never writes the 58 MB KV stream back.

Same playbook as ops/pallas/cp_decode.py (BP=8 row padding, masked row
extraction instead of unaligned gathers, fused int8 qkv/gateup layout
from ops/quant.quantize_talker).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_tts_tpu.ops.pallas.common import qmm as _qmm
from qwen3_tts_tpu.ops.pallas.common import rms as _rms
from qwen3_tts_tpu.ops.pallas.common import rot_mat as _rot_mat
from qwen3_tts_tpu.ops.pallas.common import NEG
BP = 8  # padded batch rows (one sublane tile)


def _make_kernel(B, L, nH, nKV, S, Dh, H, I, eps):
    G = nH // nKV
    QD, KVD = nH * Dh, nKV * Dh

    def kernel(pos_sref,                 # (B,) i32 positions (SMEM)
               rope_cos, rope_sin,       # (S, Dh) f32
               x_in,                     # (BP, H) bf16 initial hidden
               qkv_q, qkv_s,             # (1, H, N) int8 / (1, 1, N)
               o_q, o_s,                 # (1, QD, H)
               gu_q, gu_s,               # (1, H, 2I)
               d_q, d_s,                 # (1, I, H)
               input_ln, post_ln,        # (1, 1, H)
               qn_w, kn_w,               # (1, 1, Dh)
               kv_blk,                   # (1, 2, B, S, nKV, Dh) bf16
               h_out,                    # (BP, H) bf16
               rows_out,                 # (1, 2, B, nKV, Dh) f32
               h_scr, cos_scr, sin_scr):  # (BP,H) f32, (BP,Dh) f32 x2
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            h_scr[...] = x_in[...].astype(jnp.float32)
            # per-row rope rows: SMEM scalars broadcast freely, so a
            # masked reduction per row extracts table row pos[b] (dynamic
            # sublane gathers aren't expressible in Mosaic)
            srow = jax.lax.broadcasted_iota(jnp.int32, (S, Dh), 0)
            for b in range(B):
                m = srow == pos_sref[b]
                cos_scr[b, :] = jnp.sum(
                    jnp.where(m, rope_cos[...], 0.0), axis=0)
                sin_scr[b, :] = jnp.sum(
                    jnp.where(m, rope_sin[...], 0.0), axis=0)

        x = h_scr[...]                                     # (BP, H) f32
        hn = _rms(x, input_ln[0, 0], eps).astype(jnp.bfloat16)
        qkv = _qmm(hn, qkv_q[0], qkv_s[0, 0])                 # (BP, QD+2KVD)
        q = qkv[:, :QD].reshape(BP * nH, Dh)
        k = qkv[:, QD:QD + KVD].reshape(BP * nKV, Dh)
        v = qkv[:, QD + KVD:].reshape(BP * nKV, Dh)

        q = _rms(q, qn_w[0, 0], eps)
        k = _rms(k, kn_w[0, 0], eps)

        # rope with per-row cos/sin (row b's angle at pos[b])
        rot = _rot_mat(Dh)
        cos_q = jnp.broadcast_to(cos_scr[...][:, None, :],
                                 (BP, nH, Dh)).reshape(BP * nH, Dh)
        sin_q = jnp.broadcast_to(sin_scr[...][:, None, :],
                                 (BP, nH, Dh)).reshape(BP * nH, Dh)
        cos_k = jnp.broadcast_to(cos_scr[...][:, None, :],
                                 (BP, nKV, Dh)).reshape(BP * nKV, Dh)
        sin_k = jnp.broadcast_to(sin_scr[...][:, None, :],
                                 (BP, nKV, Dh)).reshape(BP * nKV, Dh)
        q = q * cos_q + jnp.dot(q, rot,
                                preferred_element_type=jnp.float32) * sin_q
        k = k * cos_k + jnp.dot(k, rot,
                                preferred_element_type=jnp.float32) * sin_k

        scale = 1.0 / (Dh ** 0.5)
        SH = S * nKV
        # full-width attention: per row b, all heads in two MXU dots over
        # the merged (S*Hkv, Dh) KV view, masked per head-group
        col = jax.lax.broadcasted_iota(jnp.int32, (nH, SH), 1)
        h_of = col % nKV                     # kv head of each column
        s_of = col // nKV                    # position of each column
        qhead = jax.lax.broadcasted_iota(jnp.int32, (nH, SH), 0) // G

        outs = []
        for b in range(B):
            pb = pos_sref[b]                               # SMEM scalar
            k_new = k[b * nKV:(b + 1) * nKV, :]            # (nKV, Dh) f32
            v_new = v[b * nKV:(b + 1) * nKV, :]
            rows_out[0, 0, b] = k_new
            rows_out[0, 1, b] = v_new

            # substitute the fresh rows at position pb (cache row stale);
            # stay in bf16 — f32 copies of the (SH, Dh) views double the
            # scoped-vmem footprint for no accuracy gain (the dots
            # accumulate in f32 regardless). NOTE: a "separate softmax
            # piece for the fresh row" variant (no full-width selects)
            # sends the Mosaic compile into a >9 min tailspin — keep the
            # simple substitution.
            rq = jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0) // nKV
            sub = rq == pb                                 # (SH, 1) rows
            k_tile = jnp.broadcast_to(
                k_new.astype(jnp.bfloat16)[None],
                (S, nKV, Dh)).reshape(SH, Dh)
            v_tile = jnp.broadcast_to(
                v_new.astype(jnp.bfloat16)[None],
                (S, nKV, Dh)).reshape(SH, Dh)
            K_eff = jnp.where(sub, k_tile, kv_blk[0, 0, b].reshape(SH, Dh))
            V_eff = jnp.where(sub, v_tile, kv_blk[0, 1, b].reshape(SH, Dh))

            qb = q[b * nH:(b + 1) * nH, :]                # (nH, Dh)
            sc = jax.lax.dot_general(
                qb.astype(jnp.bfloat16), K_eff,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (nH, SH)
            valid = (h_of == qhead) & (s_of <= pb)
            sc = jnp.where(valid, sc, NEG)
            sc = sc - jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            p = jnp.where(valid, p, 0.0)
            outs.append(jnp.dot(p.astype(jnp.bfloat16), V_eff,
                                preferred_element_type=jnp.float32))
        attn = jnp.concatenate(outs, axis=0)               # (B*nH, Dh)
        if B < BP:
            attn = jnp.concatenate(
                [attn, jnp.zeros(((BP - B) * nH, Dh), jnp.float32)], axis=0)
        attn = attn.reshape(BP, QD).astype(jnp.bfloat16)
        x = x + _qmm(attn, o_q[0], o_s[0, 0])

        hn = _rms(x, post_ln[0, 0], eps).astype(jnp.bfloat16)
        gu = _qmm(hn, gu_q[0], gu_s[0, 0])                    # (BP, 2I)
        g = gu[:, :I]
        u = gu[:, I:]
        act = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
        x = x + _qmm(act, d_q[0], d_s[0, 0])
        h_scr[...] = x

        @pl.when(i == L - 1)
        def _done():
            h_out[...] = x.astype(h_out.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def talker_decode_step_fused(
    layers: Dict,             # stacked fused-int8 layer pytree
    x: jax.Array,             # (B, H) bf16 feedback embedding
    pos: jax.Array,           # (B,) int32 write positions
    kv: jax.Array,            # (L, 2, B, S, Hkv, Dh)
    rope_cos: jax.Array,      # (S, Dh) f32
    rope_sin: jax.Array,
    *,
    eps: float,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One fused talker decode step. Returns (hidden (B, H) pre-final-norm,
    updated kv). See module docstring; applies to the
    ops/quant.quantize_talker layout (fused qkv/gateup QTensors)."""
    from qwen3_tts_tpu.ops.quant import QTensor

    qkv_t: QTensor = layers["qkv_proj"]
    o_t: QTensor = layers["o_proj"]
    gu_t: QTensor = layers["gateup_proj"]
    d_t: QTensor = layers["down_proj"]
    L, H, QKVD = qkv_t.q.shape
    Dh = layers["q_norm"].shape[-1]
    # fused layout drops k_proj; infer head split from o_proj's input dim
    QD = o_t.q.shape[1]
    nH = QD // Dh
    nKV = (QKVD - QD) // (2 * Dh)
    I = d_t.q.shape[1]
    B, S = kv.shape[2], kv.shape[3]
    assert B <= BP, B

    x_pad = jnp.zeros((BP, H), jnp.bfloat16).at[:B].set(
        x.astype(jnp.bfloat16))

    kern = _make_kernel(B, L, nH, nKV, S, Dh, H, I, eps)

    # index_maps receive (grid idx, scalar-prefetch ref); positions ride
    # in SMEM so the kernel reads them as true scalars (Mosaic broadcasts
    # scalars over any shape; (1,1) vectors it cannot)
    def inv(a):
        return pl.BlockSpec(a.shape, lambda i, ps, _n=a.ndim: (0,) * _n,
                            memory_space=pltpu.VMEM)

    def per_layer(a):
        shp = (1,) + a.shape[1:]
        return pl.BlockSpec(
            shp, lambda i, ps, _n=a.ndim: (i,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM)

    kv_bf = kv.astype(jnp.bfloat16)
    def v3(a):
        # per-layer vectors ride as (L, 1, N): a (1, 1, N) block satisfies
        # Mosaic's last-two-dims rule (dim -2 equals the overall array's)
        return a.astype(jnp.float32).reshape(L, 1, -1)

    operands = [
        rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32),
        x_pad,
        qkv_t.q, v3(qkv_t.scale),
        o_t.q, v3(o_t.scale),
        gu_t.q, v3(gu_t.scale),
        d_t.q, v3(d_t.scale),
        v3(layers["input_ln"]),
        v3(layers["post_ln"]),
        v3(layers["q_norm"]),
        v3(layers["k_norm"]),
        kv_bf,
    ]
    in_specs = [inv(operands[0]), inv(operands[1]), inv(operands[2])]
    in_specs += [per_layer(a) for a in operands[3:15]]
    in_specs += [pl.BlockSpec((1,) + kv_bf.shape[1:],
                              lambda i, ps: (i, 0, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((BP, H), lambda i, ps: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, nKV, Dh), lambda i, ps: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BP, H), jnp.float32),
            pltpu.VMEM((BP, Dh), jnp.float32),
            pltpu.VMEM((BP, Dh), jnp.float32),
        ],
    )
    h_out, rows = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BP, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, 2, B, nKV, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pos.astype(jnp.int32), *operands)

    # scatter the fresh K/V rows into the cache: one XLA scatter per step
    b_idx = jnp.arange(B)
    new_kv = kv.at[:, :, b_idx, pos].set(
        rows.astype(kv.dtype))     # (L, 2, B, nKV, Dh) rows at pos[b]
    return h_out[:B].astype(x.dtype), new_kv
