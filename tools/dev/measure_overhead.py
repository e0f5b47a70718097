import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from functools import partial
from qwen3_tts_tpu.config import TTSConfig
from qwen3_tts_tpu.io import weights as weights_io
from qwen3_tts_tpu.engine import generate as gen
from qwen3_tts_tpu.models import talker as tk

cfg = TTSConfig()
params = weights_io.init_random_params(cfg, 0, jnp.bfloat16)
tp, cpp = params["talker"], params["code_predictor"]
ids = jnp.asarray(np.arange(100,132, dtype=np.int32)); n_text = jnp.int32(30)

init = jax.jit(lambda tp, ids, n, key: gen.init_state(
    tp, tk.build_prefix(tp, ids, n)[0][None].astype(tp["codec_embedding"].dtype),
    tk.build_prefix(tp, ids, n)[1][None], n[None], key, cfg))
run16 = jax.jit(partial(gen.run_steps, cfg=cfg, max_steps=16))

s0 = init(tp, ids, n_text, jax.random.PRNGKey(0))
s = run16(tp, cpp, s0); _ = jax.device_get(s.done)
print("compiled", flush=True)

for trial in range(3):
    s = init(tp, ids, n_text, jax.random.PRNGKey(trial))
    t0 = time.perf_counter()
    for i in range(5):
        s = run16(tp, cpp, s)
    n = int(jax.device_get(s.n_codes)[0])
    dt = time.perf_counter() - t0
    print(f"5x run16: {dt*1000:.1f}ms n={n} -> per-call {(dt*1000)/5:.1f}ms, per-tok {dt/max(n,1)*1000:.2f}ms", flush=True)

s = init(tp, ids, n_text, jax.random.PRNGKey(9))
t0 = time.perf_counter()
s1 = run16(tp, cpp, s)
t1 = time.perf_counter()
print(f"dispatch latency (no sync): {(t1-t0)*1000:.1f}ms", flush=True)
_ = jax.device_get(s1.done)
t0 = time.perf_counter(); _ = jax.device_get(s1.done[0]); print(f"device_get tiny: {(time.perf_counter()-t0)*1000:.1f}ms", flush=True)
t0 = time.perf_counter(); _ = jax.device_get(s1.codes); print(f"device_get codes: {(time.perf_counter()-t0)*1000:.1f}ms", flush=True)
