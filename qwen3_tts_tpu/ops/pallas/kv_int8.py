"""Pallas TPU kernel: single-token GQA decode attention over a
per-row scaled **int8 KV cache** (round-4 VERDICT #5 probe).

Motivation: in the BATCHED serving tier the bf16 talker weight stream
amortizes across slots, but the KV stream grows with them — at batch 8 x
512 positions the per-step KV read (~0.94 GB) rivals the ~0.9 GB weight
stream batching was meant to amortize. Storing K/V as int8 with one f32
scale per (position, kv-head) row halves that stream; the dequantize
happens in VMEM after the DMA (multiply by the row scale), so HBM traffic
actually halves — unlike an XLA-level ``int8 -> bf16`` convert, which
materializes the bf16 copy in HBM first (the measured failure mode of
the weight-int8 XLA path, docs/BENCHMARKS.md).

Quantization contract: ``q(x) = round(x * 127 / max|row|)`` per
(position, head) row at append time; attention reads
``softmax(q @ (s_j k_j)^T) @ (s_j v_j)`` — mathematically
``s_j * (q @ k_j)``, computed here by dequantizing the VMEM-resident
block. Numerics bound measured by tools/dev/bench_kv_int8.py (hidden
cosine vs the bf16 cache) and pinned at tiny geometry in
tests/test_kv_int8.py.

Cache layout is kernel-native ``(B, Hkv, S, Dh)`` (no per-step
transposed copies — the review note on decode_attention.py's swapaxes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_kv_rows(rows: jax.Array):
    """Per-row symmetric int8: ``rows`` (..., Dh) -> (int8 rows,
    f32 scales (...,)). Zero rows quantize to zeros with scale 0."""
    amax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(rows.astype(jnp.float32) * inv[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _attn_kernel_kv8(pos_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                     o_ref):
    i = pl.program_id(0)
    pos = pos_ref[i]
    q = q_ref[0].astype(jnp.float32)                     # (G, Dh)
    ks = ks_ref[0].astype(jnp.float32)                   # (S, 1)
    vs = vs_ref[0].astype(jnp.float32)                   # (S, 1)
    k = kq_ref[0].astype(jnp.float32) * ks               # (S, Dh) dequant
    v = vq_ref[0].astype(jnp.float32) * vs
    dh = q.shape[-1]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    s = s * jax.lax.rsqrt(jnp.float32(dh))
    S = k.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    s = jnp.where(j <= pos, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_kv_int8(q: jax.Array,
                             kq: jax.Array, ks: jax.Array,
                             vq: jax.Array, vs: jax.Array,
                             pos: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Fused decode attention over the int8 cache.

    q:  (B, Hq, Dh) post-RoPE new-token queries;
    kq/vq: (B, Hkv, S, Dh) int8 cache (new rows already written at pos);
    ks/vs: (B, Hkv, S) f32 per-row scales;
    pos: (B,) int32 — attend keys [0..pos] inclusive.
    Returns (B, Hq*Dh) in q.dtype.
    """
    B, Hq, Dh = q.shape
    Hkv, S = kq.shape[1], kq.shape[2]
    G = Hq // Hkv

    qg = q.reshape(B, Hkv, G, Dh).reshape(B * Hkv, G, Dh)
    kqg = kq.reshape(B * Hkv, S, Dh)
    vqg = vq.reshape(B * Hkv, S, Dh)
    # scales ride as (rows, S, 1): Mosaic requires the last two block
    # dims be /8- and /128-divisible OR equal to the array dims — a
    # (1, S) block fails the first-dim rule, (1, S, 1) satisfies both
    ksg = ks.reshape(B * Hkv, S, 1)
    vsg = vs.reshape(B * Hkv, S, 1)
    pos_rep = jnp.repeat(pos.astype(jnp.int32), Hkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * Hkv,),
        in_specs=[
            pl.BlockSpec((1, G, Dh), lambda i, p_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dh), lambda i, p_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda i, p_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dh), lambda i, p_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda i, p_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, Dh), lambda i, p_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _attn_kernel_kv8,
        out_shape=jax.ShapeDtypeStruct((B * Hkv, G, Dh), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * S * Dh,
            # the point of the kernel: K+V int8 (1 byte) + scales
            bytes_accessed=2 * B * S * Hkv * (Dh + 4) + B * Hq * Dh * 4,
            transcendentals=B * Hq * S,
        ),
        interpret=interpret,
    )(pos_rep, qg, kqg, ksg, vqg, vsg)
    return out.reshape(B, Hq * Dh)
