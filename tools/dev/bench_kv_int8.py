"""int8-KV probe for the batched serving tier (round-4 VERDICT #5).

Question: the batched talker's bf16 weight stream amortizes across slots,
but its KV read stream grows with them (~117 MB/slot/step at S=512 full
geometry). Does a per-row scaled int8 KV cache — quantize at append,
dequantize in VMEM inside a Pallas attention kernel
(ops/pallas/kv_int8.py) — buy real throughput at batch 4/8?

Method (the only rig-valid way, CLAUDE.md): ONE process, interleaved
trials of two identical talker-decode loops that differ ONLY in the KV
cache (bf16 XLA attention — the production batched path — vs int8 Pallas
attention), REP steps per dispatch to amortize the ~100 ms tunnel
round trip, timed with a real d2h fetch. Both loops consume the SAME
precomputed input sequence, so a numerics pass rides along for free:
per-step hidden cosine between the two trajectories bounds the
perturbation the int8 cache injects.

Run: python tools/dev/bench_kv_int8.py [REP] [trials]
Results go to docs/BENCHMARKS.md (win -> adopt; wash -> dead-end entry).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main() -> int:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qwen3_tts_tpu.config import TTSConfig
    from qwen3_tts_tpu.io import weights as weights_io
    from qwen3_tts_tpu.models import transformer as tfm
    from qwen3_tts_tpu.ops.pallas import kv_int8

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = TTSConfig()
    tcfg = cfg.talker
    geo = tfm.geometry_of(tcfg)
    layers = weights_io.init_random_params(
        cfg, 0, jnp.bfloat16)["talker"]["layers"]
    L, S = tcfg.num_layers, tcfg.max_seq_len
    Hq, Hkv, Dh, H = (tcfg.num_heads, tcfg.num_kv_heads, tcfg.head_dim,
                      tcfg.hidden_size)

    def bf16_loop(B):
        # the production batched decode attention: XLA gqa over the dense
        # bf16 cache (models/transformer.decode_step's layer body)
        def run(layers, xs, kv, pos0):
            def step(carry, x):
                kv, pos = carry
                h, kv = tfm.decode_step(layers, x, pos, kv, geo)
                return (kv, pos + 1), h
            (_, _), hs = jax.lax.scan(step, (kv, pos0), xs)
            return hs
        return jax.jit(run)

    def int8_loop(B):
        def decode_step_kv8(layers, x, pos, cache):
            kq, ks, vq, vs = cache
            cos, sin = tfm.rope_cos_sin(pos[:, None], Dh, tcfg.rope_theta)
            b_idx = jnp.arange(B)[:, None]
            h_idx = jnp.arange(Hkv)[None, :]

            def layer_fn(h, xs):
                layer, kq_l, ks_l, vq_l, vs_l = xs
                hn = tfm.rms_norm(h, layer["input_ln"], geo.rms_norm_eps)
                q, k, v = tfm._qkv(layer, hn[:, None, :], geo, cos, sin)
                nk, nks = kv_int8.quantize_kv_rows(k[:, 0])   # (B,Hkv,Dh)
                nv, nvs = kv_int8.quantize_kv_rows(v[:, 0])
                kq_l = kq_l.at[b_idx, h_idx, pos[:, None]].set(nk)
                ks_l = ks_l.at[b_idx, h_idx, pos[:, None]].set(nks)
                vq_l = vq_l.at[b_idx, h_idx, pos[:, None]].set(nv)
                vs_l = vs_l.at[b_idx, h_idx, pos[:, None]].set(nvs)
                attn1 = kv_int8.decode_attention_kv_int8(
                    q[:, 0], kq_l, ks_l, vq_l, vs_l, pos)
                from qwen3_tts_tpu.ops import quant
                attn = quant.matmul(attn1, layer["o_proj"]).astype(h.dtype)
                h = h + attn
                hn = tfm.rms_norm(h, layer["post_ln"], geo.rms_norm_eps)
                h = h + tfm.swiglu_mlp(hn, layer.get("gate_proj"),
                                       layer.get("up_proj"),
                                       layer["down_proj"],
                                       gateup_w=layer.get("gateup_proj"))
                return h, (kq_l, ks_l, vq_l, vs_l)

            h, cache = jax.lax.scan(layer_fn, x, (layers, *cache))
            return h, cache

        def run(layers, xs, cache, pos0):
            def step(carry, x):
                cache, pos = carry
                h, cache = decode_step_kv8(layers, x, pos, cache)
                return (cache, pos + 1), h
            (_, _), hs = jax.lax.scan(step, (cache, pos0), xs)
            return hs
        return jax.jit(run)

    results = {}
    for B in (4, 8):
        key = jax.random.PRNGKey(0)
        # prefill-like history: 40 random positions already written
        kv0 = (jax.random.normal(key, (L, 2, B, S, Hkv, Dh), jnp.bfloat16)
               * 0.02)
        mask = (jnp.arange(S) < 40)[None, :, None, None]
        kv0 = jnp.where(mask[None, None], kv0, 0)
        nk, ns = kv_int8.quantize_kv_rows(jnp.swapaxes(kv0[:, 0], 2, 3))
        nv, nvs = kv_int8.quantize_kv_rows(jnp.swapaxes(kv0[:, 1], 2, 3))
        cache0 = (nk, ns, nv, nvs)        # (L,B,Hkv,S,Dh) / (L,B,Hkv,S)
        xs = (jax.random.normal(jax.random.PRNGKey(1), (rep, B, H),
                                jnp.bfloat16) * 0.05)
        pos0 = jnp.full((B,), 40, jnp.int32)

        f16 = bf16_loop(B)
        f8 = int8_loop(B)
        h16 = f16(layers, xs, kv0, pos0)
        h8 = f8(layers, xs, cache0, pos0)
        # numerics: per-step hidden cosine between the trajectories
        a = np.asarray(h16, np.float32).reshape(rep, -1)
        b = np.asarray(h8, np.float32).reshape(rep, -1)
        cos_t = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                   * np.linalg.norm(b, axis=-1) + 1e-30)
        print(f"B={B}: hidden cosine min {cos_t.min():.6f} "
              f"last {cos_t[-1]:.6f}", file=sys.stderr, flush=True)

        times = {"bf16": [], "int8kv": []}
        for t in range(trials):
            for name, fn, kv_arg in (("bf16", f16, kv0),
                                     ("int8kv", f8, cache0)):
                t0 = time.perf_counter()
                out = fn(layers, xs, kv_arg, pos0)
                np.asarray(jax.device_get(out[-1]))
                times[name].append(time.perf_counter() - t0)
        row = {}
        for name, ts in times.items():
            ms = np.median(np.asarray(ts)) * 1e3 / rep
            row[name] = ms
            print(f"B={B} {name}: {ms:.3f} ms/step "
                  f"(min {min(ts) * 1e3 / rep:.3f})",
                  file=sys.stderr, flush=True)
        results[B] = row
        d = (row["bf16"] - row["int8kv"]) / row["bf16"] * 100
        print(f"B={B}: int8 KV delta {d:+.1f}% vs bf16",
              file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
