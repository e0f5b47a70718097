"""Pallas TPU kernel: weight-only int8 matmul with on-the-fly dequant.

Decode is HBM-bandwidth-bound; streaming int8 weights instead of bf16
halves the bytes per step. The kernel reads an int8 weight tile into VMEM,
converts to bf16 in-register, runs the MXU dot in fp32 accumulation, and
applies the per-output-channel scale on the way out — the bf16 weights
never exist in HBM.

Kernel playbook: /opt/skills/guides/pallas_guide.md (tiling constraints:
int8 min tile (32, 128); always pass preferred_element_type for the MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref):
    x = x_ref[:]                                   # (B, K) bf16
    w = q_ref[:].astype(jnp.bfloat16)              # (K, TN) int8 -> bf16
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[0, :][None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_pallas(x: jax.Array, q: jax.Array, scale: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """x: (B, K) bf16/f32; q: (K, N) int8; scale: (N,) f32 -> (B, N) f32.

    Requires K % 32 == 0 and N % TILE_N == 0 (all model dims qualify:
    K/N in {1024, 2048, 3072}).
    """
    B, K = x.shape
    K2, N = q.shape
    assert K == K2 and N % TILE_N == 0 and K % 32 == 0, (x.shape, q.shape)

    x = x.astype(jnp.bfloat16)
    s2 = scale.reshape(1, N).astype(jnp.float32)

    grid = (N // TILE_N,)
    return pl.pallas_call(
        _qmm_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TILE_N), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N + N * 4 + B * K * 2 + B * N * 4,
            transcendentals=0,
        ),
        # NOTE: allow_input_fusion=[True]*3 (fusing the lax.scan layer
        # slice into the operand read) was measured SLOWER (RTF 0.080 vs
        # 0.075) — it defeats the block pipeline. The scan-slice copy
        # problem is solved structurally instead: the talker decode step
        # unrolls over per-layer weight arrays (transformer.py
        # decode_step_unrolled), so no slice sits between HBM weights and
        # this kernel.
        interpret=interpret,
    )(x, q, s2)
