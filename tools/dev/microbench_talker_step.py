"""Talker fused-step kernel diagnostics: where does 0.89 ms go against
the ~0.61 ms weight-streaming floor?

Same-process interleaved variants (REP kernel invocations per dispatch to
amortize the tunnel round trip):
  full   — production kernel
  zeroMM — _qmm stubbed to zeros: block DMAs still run (BlockSpec-driven),
           so this isolates the dequant-cast + MXU cost of the int8
           matmuls from the weight-streaming floor
  i8dot  — _qmm as int8 x int8 MXU dot (activations crudely quantized
           in-kernel): measures what removing the int8->bf16 weight cast
           would buy (numerics NOT production-valid — timing probe only)

Run: python tools/dev/microbench_talker_step.py [n_iters]

Findings (v5e through the tunnel, 2026-08): full == zeroMM == i8dot ==
noscatter within noise (~2.1 ms/step in THIS standalone REP-loop
harness) — the kernel's weight-stream pipeline, not matmul compute or
the KV scatter, sets its standalone cost, so neither removing the
int8->bf16 cast nor an int8xint8 MXU dot buys anything. The production
fused decode loop accounts the same kernel at ~1.0-1.2 ms/step
(bench_loop_breakdown.py nocp=1.19 total talker-side), i.e. the
standalone wrapper adds pipeline-ramp overhead the production program
amortizes. NOTE: block_until_ready returns early through the tunnel
backend — always time a device_get of a real output.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main() -> int:
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qwen3_tts_tpu.config import TTSConfig
    from qwen3_tts_tpu.io import weights as weights_io
    from qwen3_tts_tpu.ops import quant as quant_ops
    from qwen3_tts_tpu.ops.pallas import talker_step as ts

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = TTSConfig()
    params = weights_io.init_random_params(cfg, 0, jnp.bfloat16)
    tp = jax.jit(quant_ops.quantize_talker)(params["talker"])
    layers = tp["layers"]

    tcfg = cfg.talker
    L, B, S = tcfg.num_layers, 1, tcfg.max_seq_len
    Dh, nKV = tcfg.head_dim, tcfg.num_kv_heads
    kv = jax.random.normal(jax.random.PRNGKey(0),
                           (L, 2, B, S, nKV, Dh), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (B, tcfg.hidden_size), jnp.bfloat16)
    pos = jnp.full((B,), 40, jnp.int32)
    p = np.arange(S, dtype=np.float32)
    inv = 1.0 / (tcfg.rope_theta ** (np.arange(0, Dh, 2) / Dh))
    ang = p[:, None] * inv[None, :]
    rc = jnp.asarray(np.concatenate([np.cos(ang)] * 2, -1), jnp.float32)
    rs = jnp.asarray(np.concatenate([np.sin(ang)] * 2, -1), jnp.float32)

    real_qmm = ts._qmm

    def qmm_zero(xx, q, s):
        return jnp.zeros((xx.shape[0], q.shape[1]), jnp.float32)

    def qmm_i8(xx, q, s):
        xi = jnp.clip(jnp.round(xx.astype(jnp.float32) * 16.0),
                      -127, 127).astype(jnp.int8)
        acc = jnp.dot(xi, q, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * ((1.0 / 16.0)
                                          * s.astype(jnp.float32))

    raw = ts.talker_decode_step_fused.__wrapped__
    REP = 20

    def make():
        def body(layers, x, pos, kv, rc, rs):
            def it(i, carry):
                x_c, kv_c = carry
                h, kv2 = raw(layers, x_c, pos + i, kv_c, rc, rs,
                             eps=tcfg.rms_norm_eps)
                return (h.astype(x_c.dtype), kv2)
            return jax.lax.fori_loop(0, REP, it, (x, kv))
        return jax.jit(body)

    def make_noscatter():
        # drop the kv carry entirely: XLA DCEs the scatter (kernel output
        # rows feed nothing) — isolates the kernel call from the carry
        # copy / scatter cost
        def body(layers, x, pos, kv, rc, rs):
            def it(i, x_c):
                h, _ = raw(layers, x_c, pos + i, kv, rc, rs,
                           eps=tcfg.rms_norm_eps)
                return h.astype(x_c.dtype)
            return jax.lax.fori_loop(0, REP, it, x)
        return jax.jit(body)

    fns = {}
    for name, qmm, mk in (("full", real_qmm, make),
                          ("zeroMM", qmm_zero, make),
                          ("i8dot", qmm_i8, make),
                          ("noscatter", real_qmm, make_noscatter)):
        ts._qmm = qmm
        try:
            fn = mk()
            jax.block_until_ready(fn(layers, x, pos, kv, rc, rs))
            fns[name] = fn
        except Exception as e:
            print(f"{name}: compile failed: {str(e)[:200]}",
                  file=sys.stderr)
    ts._qmm = real_qmm

    times = {n: [] for n in fns}
    for _ in range(n_iters):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = fn(layers, x, pos, kv, rc, rs)
            # block_until_ready through the tunnel backend returns
            # before execution completes — fetch a real value instead
            np.asarray(jax.device_get(out[0]))
            times[name].append(time.perf_counter() - t0)
    for name, ts_ in times.items():
        a = np.asarray(ts_) * 1e3
        print(f"{name}: median {np.median(a):.2f} ms / {REP} steps "
              f"= {np.median(a)/REP:.3f} ms/step  (min {a.min()/REP:.3f})",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
