"""Pallas TPU kernel: fused single-token GQA decode attention.

One kernel per (batch, kv-head) grid cell computes the whole
score -> mask -> softmax -> weighted-sum chain for that head's query
group against the full KV history in VMEM — the north-star "fused Pallas
attention" for the talker decode step. K/V for one head at S=512 is
128 KiB bf16, far under the ~16 MiB VMEM budget, so no K-loop tiling is
needed at this model's context length.

Positions arrive via scalar prefetch (pltpu.PrefetchScalarGridSpec) so the
causal bound is known before the body runs. See
/opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref):
    i = pl.program_id(0)
    pos = pos_ref[i]                               # valid keys: j <= pos
    q = q_ref[0].astype(jnp.float32)               # (G, Dh)
    k = k_ref[0].astype(jnp.float32)               # (S, Dh)
    v = v_ref[0].astype(jnp.float32)               # (S, Dh)
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
def decode_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                            pos: jax.Array, interpret: bool = False
                            ) -> jax.Array:
    """Fused decode attention.

    q: (B, Hq, Dh) new-token queries (post-RoPE);
    k/v: (B, S, Hkv, Dh) full KV cache (new k/v already written at pos);
    pos: (B,) int32 — attend keys [0..pos] inclusive.
    Returns (B, Hq*Dh) in q.dtype.
    """
    B, Hq, Dh = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv

    # (B, Hkv, G, Dh) -> rows of the grid; K to (B, Hkv, S, Dh).
    # NOTE (review finding): these swapaxes materialize transposed copies
    # of the per-layer cache each step — acceptable only because this
    # kernel is the OPT-IN attn_impl="pallas" path (the default decode
    # runs XLA attention or the fused talker-step kernel, neither of
    # which pays this); a (B, Hkv) grid over the native layout would
    # remove the copy if this path ever becomes a default.
    qg = q.reshape(B, Hkv, G, Dh).reshape(B * Hkv, G, Dh)
    kg = jnp.swapaxes(k, 1, 2).reshape(B * Hkv, S, Dh)
    vg = jnp.swapaxes(v, 1, 2).reshape(B * Hkv, S, Dh)
    pos_rep = jnp.repeat(pos.astype(jnp.int32), Hkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * Hkv,),
        in_specs=[
            pl.BlockSpec((1, G, Dh), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dh), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dh), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, Dh), lambda i, pos_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B * Hkv, G, Dh), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * S * Dh,
            bytes_accessed=2 * B * S * Hkv * Dh * 2 + B * Hq * Dh * 4,
            transcendentals=B * Hq * S,
        ),
        interpret=interpret,
    )(pos_rep, qg, kg, vg)
    return out.reshape(B, Hq * Dh)
