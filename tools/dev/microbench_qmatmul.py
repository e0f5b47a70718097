"""Microbench: int8 weight-only matmul backends under HBM streaming.

CAUTION — measurement validity on the tunneled (axon) runtime: the relay
executes programs lazily and appears to serve repeated identical
(executable, inputs) pairs from a cache, so ``block_until_ready`` wall
times here can be fiction (sub-dispatch-overhead "timings"). Trust only
measurements that (a) vary the inputs every call AND (b) force a real
device->host transfer of the result — or better, measure through
``bench.py``, whose end-to-end RTF moves with real per-token cost. The
authoritative backend comparison lives in docs/BENCHMARKS.md:
int8+pallas RTF 0.0775 < bf16 0.119 < int8-through-XLA 0.123.

Kept as a harness for eyeballing compile behavior of the three variants.

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
