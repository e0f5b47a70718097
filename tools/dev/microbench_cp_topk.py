"""Same-process A/B of the CP kernel's top-k threshold implementations on
the real chip: bitwise binary search (topk_keep_mask, production) vs the
round-2 (k-1)-max-extraction loop. Interleaved trials — the tunnel's
bimodal jitter makes cross-process A/B meaningless.

Run: python tools/dev/microbench_cp_topk.py [n_iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main() -> int:
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qwen3_tts_tpu.config import TTSConfig
    from qwen3_tts_tpu.models import code_predictor as cp
    from qwen3_tts_tpu.ops import quant as quant_ops
    from qwen3_tts_tpu.ops.pallas import cp_decode

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = TTSConfig().code_predictor
    key = jax.random.PRNGKey(0)
    params = jax.jit(cp.init_cp_params, static_argnums=(1, 2))(
        key, cfg, jnp.bfloat16)
    qp = quant_ops.quantize_code_predictor(params)

    L, nKV, S, Dh = 5, cfg.num_kv_heads, 16, cfg.head_dim
    kv = jax.random.normal(key, (L, 2, 1, S, nKV, Dh), jnp.float32) * 0.02
    pos = np.arange(S, dtype=np.float32)
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, Dh, 2) / Dh))
    ang = pos[:, None] * inv[None, :]
    rc = jnp.asarray(np.concatenate([np.cos(ang)] * 2, -1), jnp.float32)
    rs = jnp.asarray(np.concatenate([np.sin(ang)] * 2, -1), jnp.float32)
    tok0 = jnp.int32(7)
    seed = jnp.int32(1234)

    NEG = cp_decode.NEG

    def old_sample_tokens(logits, seed_col, step, *, top_k, temperature,
                          greedy):
        iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        V = logits.shape[1]

        def rm_one(_, work):
            m = jnp.max(work, axis=-1, keepdims=True)
            first = jnp.min(jnp.where(work == m, iota, V), axis=-1,
                            keepdims=True)
            return jnp.where(iota == first, NEG, work)

        rest = jax.lax.fori_loop(0, top_k - 1, rm_one, logits)
        thr = jnp.max(rest, axis=-1, keepdims=True)
        keep = logits >= thr
        masked = jnp.where(keep, logits, NEG)
        bits = (seed_col.astype(jnp.uint32) * jnp.uint32(2654435761)
                + jnp.uint32(step).astype(jnp.uint32) * jnp.uint32(40503)
                + iota.astype(jnp.uint32) * jnp.uint32(2246822519))
        bits = bits ^ (bits >> 16)
        bits = bits * jnp.uint32(2246822519)
        bits = bits ^ (bits >> 13)
        bits = bits * jnp.uint32(3266489917)
        bits = bits ^ (bits >> 16)
        u = (bits >> 9).astype(jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 23))
        u = u * (1.0 - 1e-6) + 1e-7
        gumbel = -jnp.log(-jnp.log(u))
        z = jnp.where(keep, masked * (1.0 / max(temperature, 1e-6))
                      + gumbel, NEG)
        zm = jnp.max(z, axis=-1, keepdims=True)
        return jnp.min(jnp.where(z == zm, iota, V), axis=-1,
                       keepdims=True).astype(jnp.int32)

    raw = cp_decode.cp_decode_steps.__wrapped__
    kwargs = dict(eps=cfg.rms_norm_eps, top_k=50, temperature=0.1)

    new_sample = cp_decode.sample_tokens

    # tracing happens at the first call, so flip the module global around
    # each variant's warmup call to bake the right sampler in
    REP = 20   # kernel invocations per program: amortizes the ~30 ms
    #            tunnel dispatch so the per-invocation delta is visible

    def make(n_rep):
        def body(qp, tok0, kv, rc, rs, seed):
            def it(i, tok):
                toks = raw(qp, tok, kv, rc, rs, seed + i, **kwargs)
                return toks[-1]   # serialize: feed the last draw back in
            return jax.lax.fori_loop(0, n_rep, it, tok0)
        return jax.jit(body)

    cp_decode.sample_tokens = old_sample_tokens
    fn_old = make(REP)
    r_old = np.asarray(fn_old(qp, tok0, kv, rc, rs, seed))
    cp_decode.sample_tokens = new_sample
    fn_new = make(REP)
    r_new = np.asarray(fn_new(qp, tok0, kv, rc, rs, seed))
    print(f"final token old={r_old} new={r_new} "
          f"match={np.array_equal(r_old, r_new)}", file=sys.stderr)

    times = {"old": [], "new": []}
    for _ in range(n_iters):
        for name, fn in (("old", fn_old), ("new", fn_new)):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(qp, tok0, kv, rc, rs, seed))
            times[name].append(time.perf_counter() - t0)
    for name in ("old", "new"):
        ts = np.asarray(times[name]) * 1e3
        print(f"{name}: median {np.median(ts):.3f} ms  "
              f"p10 {np.percentile(ts, 10):.3f}  "
              f"min {ts.min():.3f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
