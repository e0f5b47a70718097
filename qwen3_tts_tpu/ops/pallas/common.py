"""Numerical primitives shared by the Pallas TPU kernels
(cp_decode.py, talker_step.py). One implementation each — an eps or
precision change here reaches both kernels, so talker and code-predictor
numerics cannot silently diverge."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# shared masking constant for attention/sampling (one definition so a
# future change — e.g. a bf16-safe value — cannot diverge per kernel)
NEG = -1e30


def rms(x, w, eps):
    """RMSNorm rows of x (.., D) in f32; returns f32.

    Deliberately NOT the HF cast order (transformer.rms_norm rounds the
    normalized x to the input dtype BEFORE the weight multiply,
    modeling_qwen3 semantics): in-kernel everything stays f32 until the
    caller casts, which differs from the XLA path by <= 1 bf16 ulp per
    element in favor of MORE precision. Kernel-vs-XLA parity tests
    carry tolerances for this; the kernels' int8 weight quantization is
    the far larger deviation."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def rot_mat(dh):
    """(Dh, Dh) f32 R with (x @ R) == rotate_half(x) (HF convention:
    rotate_half(x) = concat(-x[d/2:], x[:d/2]))."""
    half = dh // 2
    r = jax.lax.broadcasted_iota(jnp.int32, (dh, dh), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (dh, dh), 1)
    return (jnp.where(r == c + half, -1.0, 0.0)
            + jnp.where(r + half == c, 1.0, 0.0)).astype(jnp.float32)


def qmm(x, q, s):
    """x (R, K) @ int8 q (K, N) * per-col scale s ((N,) or (1, N)) -> f32.
    The int8 block is cast to bf16 in-register (weights never exist in
    HBM as bf16); accumulation is f32 on the MXU."""
    acc = jnp.dot(x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return acc * s.astype(jnp.float32).reshape(1, -1)
