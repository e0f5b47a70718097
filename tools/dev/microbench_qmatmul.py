"""Microbench: int8 weight-only matmul backends under real HBM streaming.

The decode loop streams ~0.9GB of weights per token; whether int8 helps
depends on whether the backend streams int8 bytes (Pallas kernel, or XLA
if it fuses the convert into the dot) or materializes a bf16 copy first.
This bench loops over a STACK of L weights inside one jitted fori_loop so
every iteration must stream a fresh weight from HBM (stack >> VMEM), and
reports effective GB/s against the int8 byte count.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/dev/microbench_qmatmul.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.ops import quant
from qwen3_tts_tpu.ops.pallas.qmatmul import qmatmul_pallas

K, N, L = 1024, 3072, 28
N_SHORT, N_LONG = L, 200 * L  # whole passes over the stack


def make_looped(op, n_iters):
    @jax.jit
    def run(x, w_args):
        def body(i, x):
            wi = jax.tree.map(lambda a: a[i % L], w_args)
            y = op(x, *wi)
            return y[:, :K].astype(jnp.bfloat16) * 1e-3
        return jax.lax.fori_loop(0, n_iters, body, x)
    return run


def time_program(run, x, w_args, reps=4):
    run(x, w_args).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(x, w_args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_variant(name, op, x, w_args, ibytes):
    t_s = time_program(make_looped(op, N_SHORT), x, w_args)
    t_l = time_program(make_looped(op, N_LONG), x, w_args)
    us = (t_l - t_s) / (N_LONG - N_SHORT) * 1e6
    print(f"  {name:12s} {us:7.2f} us/op   "
          f"{ibytes / us / 1e3:6.0f} GB/s effective")
    return us


def main():
    print(f"device: {jax.devices()[0]}  stack: {L}x({K},{N})")
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (1, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.float32)
    qt = quant.quantize_int8(w)   # (L,K,N) int8, (L,N) scales
    wb = w.astype(jnp.bfloat16)

    dense = lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32)
    int8_xla = lambda x, q, s: jnp.dot(
        x, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * s
    int8_pl = lambda x, q, s: qmatmul_pallas(x, q, s)

    bench_variant("dense_bf16", dense, x, (wb,), K * N * 2)
    bench_variant("int8_xla", int8_xla, x, (qt.q, qt.scale), K * N)
    try:
        bench_variant("int8_pallas", int8_pl, x, (qt.q, qt.scale), K * N)
    except Exception as e:
        print(f"  int8_pallas FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
