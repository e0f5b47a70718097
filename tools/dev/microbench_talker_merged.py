"""Talker fused-step kernel experiment: 2 merged weight streams vs the
production 4 (+8 vector) streams, measured IN the production fused
decode loop (ops/pallas/talker_step.py vs a local variant; same
monkeypatch-and-retrace harness as bench_loop_breakdown.py).

Hypothesis (docs/BENCHMARKS.md kernel-gap analysis): the fused step is
weight-stream-pipeline-bound (zeroMM == full in
microbench_talker_step.py), and the per-layer DMA set — four int8
matrices plus eight small vectors, each its own double-buffered
BlockSpec stream — leaves bandwidth on the floor via per-transfer issue
gaps. The variant concatenates the int8 weights into TWO per-layer
blocks (same-leading-dim pairs: [qkv|gateup] (H, QKVD+2I) and [o;down]
(QD+I, H)) so Mosaic issues 2 large DMAs per layer instead of 4.

Numerics: identical math, identical results expected (asserted on the
first trial's n_codes/codes sum).

A third variant ("mergedvec") additionally concatenates the EIGHT small
per-layer f32 vector streams (4 scales + 2 layer norms + q/k norm) into
ONE (1, 1, W) block, cutting the per-layer DMA issue count from 13
(production) to 4 (wA, wB, vec, kv).

Run: python tools/dev/microbench_talker_merged.py [n_tokens]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def _build_merged_kernel(jax, jnp, pl, pltpu, common, BP,
                         vec_merged=False):
    """A copy of ops/pallas/talker_step._make_kernel with the four int8
    weight streams merged into two (timing probe; production stays
    single-source in talker_step.py until this wins). With
    ``vec_merged`` the eight per-layer f32 vectors also ride as one
    (1, 1, W) block, sliced in-kernel at static offsets."""
    _qmm, _rms, _rot_mat, NEG = (common.qmm, common.rms, common.rot_mat,
                                 common.NEG)

    def make_kernel(B, L, nH, nKV, S, Dh, H, I, eps):
        G = nH // nKV
        QD, KVD = nH * Dh, nKV * Dh
        QKVD = QD + 2 * KVD

        def kernel(pos_sref, rope_cos, rope_sin, x_in, *rest):
            if vec_merged:
                (wA, wB, vec, kv_blk, h_out, rows_out,
                 h_scr, cos_scr, sin_scr) = rest
                # vec layout: [sA | sB | input_ln | post_ln | qn | kn]
                o0 = 0
                sA_ = vec[0, :, o0:o0 + QKVD + 2 * I]; o0 += QKVD + 2 * I
                sB_ = vec[0, :, o0:o0 + 2 * H]; o0 += 2 * H
                input_ln = vec[0, :, o0:o0 + H][None]; o0 += H
                post_ln = vec[0, :, o0:o0 + H][None]; o0 += H
                qn_w = vec[0, :, o0:o0 + Dh][None]; o0 += Dh
                kn_w = vec[0, :, o0:o0 + Dh][None]
                sA = sA_[None]
                sB = sB_[None]
            else:
                (wA, sA, wB, sB, input_ln, post_ln, qn_w, kn_w,
                 kv_blk, h_out, rows_out,
                 h_scr, cos_scr, sin_scr) = rest
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                h_scr[...] = x_in[...].astype(jnp.float32)
                srow = jax.lax.broadcasted_iota(jnp.int32, (S, Dh), 0)
                for b in range(B):
                    m = srow == pos_sref[b]
                    cos_scr[b, :] = jnp.sum(
                        jnp.where(m, rope_cos[...], 0.0), axis=0)
                    sin_scr[b, :] = jnp.sum(
                        jnp.where(m, rope_sin[...], 0.0), axis=0)

            x = h_scr[...]
            hn = _rms(x, input_ln[0, 0], eps).astype(jnp.bfloat16)
            qkv = _qmm(hn, wA[0, :, :QKVD], sA[0, 0, :QKVD])
            q = qkv[:, :QD].reshape(BP * nH, Dh)
            k = qkv[:, QD:QD + KVD].reshape(BP * nKV, Dh)
            v = qkv[:, QD + KVD:].reshape(BP * nKV, Dh)

            q = _rms(q, qn_w[0, 0], eps)
            k = _rms(k, kn_w[0, 0], eps)

            rot = _rot_mat(Dh)
            cos_q = jnp.broadcast_to(cos_scr[...][:, None, :],
                                     (BP, nH, Dh)).reshape(BP * nH, Dh)
            sin_q = jnp.broadcast_to(sin_scr[...][:, None, :],
                                     (BP, nH, Dh)).reshape(BP * nH, Dh)
            cos_k = jnp.broadcast_to(cos_scr[...][:, None, :],
                                     (BP, nKV, Dh)).reshape(BP * nKV, Dh)
            sin_k = jnp.broadcast_to(sin_scr[...][:, None, :],
                                     (BP, nKV, Dh)).reshape(BP * nKV, Dh)
            q = q * cos_q + jnp.dot(
                q, rot, preferred_element_type=jnp.float32) * sin_q
            k = k * cos_k + jnp.dot(
                k, rot, preferred_element_type=jnp.float32) * sin_k

            scale = 1.0 / (Dh ** 0.5)
            SH = S * nKV
            col = jax.lax.broadcasted_iota(jnp.int32, (nH, SH), 1)
            h_of = col % nKV
            s_of = col // nKV
            qhead = jax.lax.broadcasted_iota(jnp.int32, (nH, SH), 0) // G

            outs = []
            for b in range(B):
                pb = pos_sref[b]
                k_new = k[b * nKV:(b + 1) * nKV, :]
                v_new = v[b * nKV:(b + 1) * nKV, :]
                rows_out[0, 0, b] = k_new
                rows_out[0, 1, b] = v_new
                rq = jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0) // nKV
                sub = rq == pb
                k_tile = jnp.broadcast_to(
                    k_new.astype(jnp.bfloat16)[None],
                    (S, nKV, Dh)).reshape(SH, Dh)
                v_tile = jnp.broadcast_to(
                    v_new.astype(jnp.bfloat16)[None],
                    (S, nKV, Dh)).reshape(SH, Dh)
                K_eff = jnp.where(sub, k_tile,
                                  kv_blk[0, 0, b].reshape(SH, Dh))
                V_eff = jnp.where(sub, v_tile,
                                  kv_blk[0, 1, b].reshape(SH, Dh))
                qb = q[b * nH:(b + 1) * nH, :]
                sc = jax.lax.dot_general(
                    qb.astype(jnp.bfloat16), K_eff,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                valid = (h_of == qhead) & (s_of <= pb)
                sc = jnp.where(valid, sc, NEG)
                sc = sc - jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                p = jnp.where(valid, p, 0.0)
                outs.append(jnp.dot(p.astype(jnp.bfloat16), V_eff,
                                    preferred_element_type=jnp.float32))
            attn = jnp.concatenate(outs, axis=0)
            if B < BP:
                attn = jnp.concatenate(
                    [attn, jnp.zeros(((BP - B) * nH, Dh), jnp.float32)],
                    axis=0)
            attn = attn.reshape(BP, QD).astype(jnp.bfloat16)
            x = x + _qmm(attn, wB[0, :QD, :], sB[0, 0, :H])

            hn = _rms(x, post_ln[0, 0], eps).astype(jnp.bfloat16)
            gu = _qmm(hn, wA[0, :, QKVD:], sA[0, 0, QKVD:])
            g = gu[:, :I]
            u = gu[:, I:]
            act = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
            x = x + _qmm(act, wB[0, QD:, :], sB[0, 0, H:])
            h_scr[...] = x

            @pl.when(i == L - 1)
            def _done():
                h_out[...] = x.astype(h_out.dtype)

        return kernel

    return make_kernel


def main() -> int:
    n_tok = int(sys.argv[1]) if len(sys.argv) > 1 else 96

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qwen3_tts_tpu.config import TTSConfig
    from qwen3_tts_tpu.engine import generate as gen
    from qwen3_tts_tpu.io import weights as weights_io
    from qwen3_tts_tpu.models import talker as tk
    from qwen3_tts_tpu.ops import quant as quant_ops
    from qwen3_tts_tpu.ops.pallas import common
    from qwen3_tts_tpu.ops.pallas import talker_step as ts

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = TTSConfig()
    params = weights_io.init_random_params(cfg, 0, jnp.bfloat16)
    params["talker"] = jax.jit(quant_ops.quantize_talker)(params["talker"])
    params["code_predictor"] = jax.jit(quant_ops.quantize_code_predictor)(
        params["code_predictor"])
    tp, cpp = params["talker"], params["code_predictor"]
    layers = tp["layers"]

    # pre-merge the weight blocks ON DEVICE, once (closure constants of
    # the merged variant — keeps the in-loop program free of the concat)
    @jax.jit
    def premerge(layers):
        qkv, o = layers["qkv_proj"], layers["o_proj"]
        gu, d = layers["gateup_proj"], layers["down_proj"]
        out = {
            "wA": jnp.concatenate([qkv.q, gu.q], axis=2),
            "sA": jnp.concatenate([qkv.scale, gu.scale], axis=-1),
            "wB": jnp.concatenate([o.q, d.q], axis=1),
            "sB": jnp.concatenate([o.scale, d.scale], axis=-1),
        }
        L = qkv.q.shape[0]

        def v2(a):
            return a.astype(jnp.float32).reshape(L, 1, -1)

        out["vec"] = jnp.concatenate(
            [v2(out["sA"]), v2(out["sB"]), v2(layers["input_ln"]),
             v2(layers["post_ln"]), v2(layers["q_norm"]),
             v2(layers["k_norm"])], axis=-1)
        return out

    merged = premerge(layers)
    BP = ts.BP

    def build_step(vec_merged):
        make_kernel = _build_merged_kernel(jax, jnp, pl, pltpu, common, BP,
                                           vec_merged=vec_merged)

        @functools.partial(jax.jit, static_argnames=("eps",))
        def merged_step(layers, x, pos, kv, rope_cos, rope_sin, *, eps):
            L, H, QKVD = layers["qkv_proj"].q.shape
            Dh = layers["q_norm"].shape[-1]
            QD = layers["o_proj"].q.shape[1]
            nH = QD // Dh
            nKV = (QKVD - QD) // (2 * Dh)
            I = layers["down_proj"].q.shape[1]
            B, S = kv.shape[2], kv.shape[3]

            x_pad = jnp.zeros((BP, H), jnp.bfloat16).at[:B].set(
                x.astype(jnp.bfloat16))
            kern = make_kernel(B, L, nH, nKV, S, Dh, H, I, eps)

            def inv(a):
                return pl.BlockSpec(a.shape,
                                    lambda i, ps, _n=a.ndim: (0,) * _n,
                                    memory_space=pltpu.VMEM)

            def per_layer(a):
                shp = (1,) + a.shape[1:]
                return pl.BlockSpec(
                    shp, lambda i, ps, _n=a.ndim: (i,) + (0,) * (_n - 1),
                    memory_space=pltpu.VMEM)

            kv_bf = kv.astype(jnp.bfloat16)

            def v3(a):
                return a.astype(jnp.float32).reshape(L, 1, -1)

            # the merged tensors ride IN the layers pytree (keys m_*) —
            # closure-captured 440 MB constants blow the tunnel's
            # remote-compile request-body limit (HTTP 413)
            if vec_merged:
                operands = [
                    rope_cos.astype(jnp.float32),
                    rope_sin.astype(jnp.float32), x_pad,
                    layers["m_wA"], layers["m_wB"], layers["m_vec"], kv_bf,
                ]
                in_specs = [inv(operands[0]), inv(operands[1]),
                            inv(operands[2])]
                in_specs += [per_layer(a) for a in operands[3:6]]
            else:
                operands = [
                    rope_cos.astype(jnp.float32),
                    rope_sin.astype(jnp.float32), x_pad,
                    layers["m_wA"], v3(layers["m_sA"]),
                    layers["m_wB"], v3(layers["m_sB"]),
                    v3(layers["input_ln"]), v3(layers["post_ln"]),
                    v3(layers["q_norm"]), v3(layers["k_norm"]),
                    kv_bf,
                ]
                in_specs = [inv(operands[0]), inv(operands[1]),
                            inv(operands[2])]
                in_specs += [per_layer(a) for a in operands[3:11]]
            in_specs += [pl.BlockSpec((1,) + kv_bf.shape[1:],
                                      lambda i, ps: (i, 0, 0, 0, 0, 0),
                                      memory_space=pltpu.VMEM)]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(L,),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((BP, H), lambda i, ps: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, B, nKV, Dh),
                                 lambda i, ps: (i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((BP, H), jnp.float32),
                    pltpu.VMEM((BP, Dh), jnp.float32),
                    pltpu.VMEM((BP, Dh), jnp.float32),
                ],
            )
            h_out, rows = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((BP, H), jnp.bfloat16),
                    jax.ShapeDtypeStruct((L, 2, B, nKV, Dh), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        pltpu.GridDimensionSemantics.ARBITRARY,),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(pos.astype(jnp.int32), *operands)
            b_idx = jnp.arange(B)
            new_kv = kv.at[:, :, b_idx, pos].set(rows.astype(kv.dtype))
            return h_out[:B].astype(x.dtype), new_kv

        return merged_step

    ids = jnp.asarray(np.arange(100, 132, dtype=np.int32))
    n_text = jnp.int32(30)
    init = jax.jit(lambda tp, ids, n, key: gen.init_state(
        tp,
        tk.build_prefix(tp, ids, n)[0][None].astype(
            tp["codec_embedding"].dtype),
        tk.build_prefix(tp, ids, n)[1][None], n[None], key, cfg))

    # the merged blocks ride through the layers pytree as ARGUMENTS (m_*
    # keys) so the jitted programs carry no giant closure constants
    tp_m = dict(tp)
    tp_m["layers"] = {**layers,
                      "m_wA": merged["wA"], "m_sA": merged["sA"],
                      "m_wB": merged["wB"], "m_sB": merged["sB"],
                      "m_vec": merged["vec"]}

    real_fused = ts.talker_decode_step_fused
    s0 = init(tp, ids, n_text, jax.random.PRNGKey(0))
    variants = {}
    checks = {}
    for name, step_fn, tp_v in (("full", real_fused, tp),
                                ("merged", build_step(False), tp_m),
                                ("mergedvec", build_step(True), tp_m)):
        ts.talker_decode_step_fused = step_fn
        fn = jax.jit(lambda tp, cpp, s: gen.run_steps(tp, cpp, s, cfg,
                                                      n_tok))
        t0 = time.perf_counter()
        try:
            s = fn(tp_v, cpp, s0)
            checks[name] = (int(np.asarray(jax.device_get(s.n_codes))[0]),
                            int(np.asarray(jax.device_get(s.codes)).sum()))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:300]}", file=sys.stderr,
                  flush=True)
            continue
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s "
              f"check={checks[name]}", file=sys.stderr, flush=True)
        variants[name] = (fn, tp_v)
    ts.talker_decode_step_fused = real_fused
    for name in variants:
        assert checks[name] == checks["full"], (
            f"{name} kernel diverged", checks)

    results = {k: [] for k in variants}
    for trial in range(6):
        for name, (fn, tp_v) in variants.items():
            s0 = init(tp, ids, n_text, jax.random.PRNGKey(10 + trial))
            np.asarray(jax.device_get(s0.pos))
            t0 = time.perf_counter()
            s = fn(tp_v, cpp, s0)
            n = int(np.asarray(jax.device_get(s.n_codes))[0])
            dt = time.perf_counter() - t0
            results[name].append(dt / max(n, 1) * 1000)
            print(f"trial {trial} {name}: n={n} {dt * 1000:.0f}ms "
                  f"-> {dt / max(n, 1) * 1000:.2f} ms/tok",
                  file=sys.stderr, flush=True)

    med = {k: float(np.median(v)) for k, v in results.items()}
    print(f"medians ms/tok: {med}", file=sys.stderr, flush=True)
    import json
    print(json.dumps({"metric": "talker_merged_streams_ms_per_tok", **med}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
