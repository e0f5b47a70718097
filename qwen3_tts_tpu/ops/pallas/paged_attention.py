"""Pallas TPU paged decode attention: one query token per slot attends
over a block-paged KV pool through a per-slot page table.

Why paging (SURVEY §7 hard part 4): the dense cache allocates
``B x max_seq_len`` rows up front, so every slot pays the worst case and
the generation length is capped by the allocation. Here slots own pages of
``page_size`` rows from a shared pool; the scheduler grows a slot's table
between decode chunks, so memory tracks actual usage and a single request
can run past the dense cap.

The kernel is the classic TPU paged-attention shape: the page table and
per-slot lengths ride in scalar-prefetch SMEM, every grid step (b, j)
DMA-fetches page ``table[b, j]`` of K and V (the index_map reads the
scalar ref — pages stream HBM->VMEM with no host gathers and no
materialized contiguous copy), and a flash-style online softmax
accumulates across pages in VMEM scratch. GQA is handled per-kv-head like
ops/pallas/cp_decode.py.

``paged_decode_attention`` dispatches to the kernel on TPU and to an XLA
gather fallback elsewhere (CPU tests; also the numerical oracle for the
kernel's interpret-mode parity test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_tts_tpu.ops.pallas.common import NEG


def paged_gather_kv(pool: jax.Array, table: jax.Array) -> jax.Array:
    """XLA fallback: materialize each slot's logical KV view.

    pool: (2, P, psz, Hkv, Dh); table: (B, MAXP) int32 (0-filled beyond
    the allocated pages — masked by position downstream).
    Returns (2, B, MAXP*psz, Hkv, Dh)."""
    g = pool[:, table]                # (2, B, MAXP, psz, Hkv, Dh)
    two, B, MAXP, psz, Hkv, Dh = g.shape
    return g.reshape(two, B, MAXP * psz, Hkv, Dh)


def _make_kernel(B, MAXP, psz, Hq, Hkv, Dh):
    G = Hq // Hkv

    def kernel(table_ref, pos_ref,            # SMEM scalar prefetch
               q_ref,                         # (1, Hq, Dh)
               k_ref, v_ref,                  # (1, psz, Hkv, Dh) = page
               out_ref,                       # (1, Hq, Dh)
               m_scr, l_scr, acc_scr):        # (Hq, 128), (Hq, 128), (Hq, Dh)
        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full((Hq, 128), NEG, jnp.float32)
            l_scr[...] = jnp.zeros((Hq, 128), jnp.float32)
            acc_scr[...] = jnp.zeros((Hq, Dh), jnp.float32)

        q = q_ref[0].astype(jnp.float32)          # (Hq, Dh)
        scale = 1.0 / (Dh ** 0.5)

        # positions covered by this page; attend to rows <= pos[b]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, psz), 1)[0]
        valid = (j * psz + row) <= pos_ref[b]     # (psz,)

        # per-kv-head scores (GQA): q rows [h*G:(h+1)*G] use kv head h
        rows = []
        for h in range(Hkv):
            kh = k_ref[0, :, h, :].astype(jnp.float32)        # (psz, Dh)
            qh = q[h * G:(h + 1) * G, :]                      # (G, Dh)
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # (G, psz)
            rows.append(sc)
        scores = jnp.concatenate(rows, axis=0)                # (Hq, psz)
        scores = jnp.where(valid[None, :], scores, NEG)

        # flash-style online softmax across pages
        m_prev = m_scr[:, 0:1]                                # (Hq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1,
                                            keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                       # (Hq, 1)
        p = jnp.exp(scores - m_new)                           # (Hq, psz)
        p = jnp.where(valid[None, :], p, 0.0)

        pv_rows = []
        for h in range(Hkv):
            vh = v_ref[0, :, h, :].astype(jnp.float32)        # (psz, Dh)
            ph = p[h * G:(h + 1) * G, :]                      # (G, psz)
            pv_rows.append(jnp.dot(ph, vh,
                                   preferred_element_type=jnp.float32))
        pv = jnp.concatenate(pv_rows, axis=0)                 # (Hq, Dh)

        l_prev = l_scr[:, 0:1]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = jnp.broadcast_to(m_new, (Hq, 128))
        l_scr[...] = jnp.broadcast_to(l_new, (Hq, 128))

        @pl.when(j == MAXP - 1)
        def _finish():
            l = l_scr[:, 0:1]
            out_ref[0] = (acc_scr[...]
                          / jnp.where(l > 0, l, 1.0)).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_pallas(
    q: jax.Array,        # (B, Hq, Dh)
    pool_k: jax.Array,   # (P, psz, Hkv, Dh)
    pool_v: jax.Array,   # (P, psz, Hkv, Dh)
    table: jax.Array,    # (B, MAXP) int32, 0-filled beyond allocation
    pos: jax.Array,      # (B,) int32 — attend to rows [0 .. pos]
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, Hq*Dh) float32 attention outputs."""
    B, Hq, Dh = q.shape
    P, psz, Hkv, _ = pool_k.shape
    MAXP = table.shape[1]

    kern = _make_kernel(B, MAXP, psz, Hq, Hkv, Dh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MAXP),
        in_specs=[
            pl.BlockSpec((1, Hq, Dh), lambda b, j, tbl, ps: (b, 0, 0)),
            pl.BlockSpec((1, psz, Hkv, Dh),
                         lambda b, j, tbl, ps: (tbl[b, j], 0, 0, 0)),
            pl.BlockSpec((1, psz, Hkv, Dh),
                         lambda b, j, tbl, ps: (tbl[b, j], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hq, Dh), lambda b, j, tbl, ps: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.ARBITRARY,
                pltpu.GridDimensionSemantics.ARBITRARY,
            )),
        interpret=interpret,
    )(table.astype(jnp.int32), pos.astype(jnp.int32), q, pool_k, pool_v)
    return out.reshape(B, Hq * Dh)


def paged_decode_attention(
    q: jax.Array,        # (B, Hq, Dh)
    pool: jax.Array,     # (2, P, psz, Hkv, Dh) — one layer's K/V pool
    table: jax.Array,    # (B, MAXP) int32
    pos: jax.Array,      # (B,) int32
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA gather fallback elsewhere.
    Returns (B, Hq*Dh) in q.dtype."""
    B, Hq, Dh = q.shape
    if jax.default_backend() == "tpu":
        out = paged_decode_attention_pallas(
            q, pool[0], pool[1], table, pos)
        return out.astype(q.dtype)
    kv = paged_gather_kv(pool, table)         # (2, B, S_log, Hkv, Dh)
    S = kv.shape[2]
    mask = (jnp.arange(S)[None, :] <= pos[:, None])[:, None, :]  # (B,1,S)
    from qwen3_tts_tpu.models import transformer as tfm
    geo = tfm.TransformerGeometry.attention_only(
        num_heads=Hq, num_kv_heads=pool.shape[3], head_dim=Dh)
    out = tfm.gqa_attention(q[:, None], kv[0], kv[1], mask, geo)[:, 0]
    # honor the 'returns in q.dtype' contract on the fallback path too:
    # gqa_attention yields v.dtype (the pool's), and this branch is the
    # kernel's interpret-mode numerical oracle — a bf16 pool would
    # otherwise make the oracle LOWER precision than the kernel it
    # validates (review finding)
    return out.astype(q.dtype)
