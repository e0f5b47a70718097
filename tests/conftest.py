"""Test config: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (the parent environment pins JAX_PLATFORMS=axon — the
real TPU — which we must not use for unit tests).

Must run before any test module imports jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite's cost is dominated by XLA compiles
# of the tiny-geometry programs; cache them across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
