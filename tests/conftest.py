"""Test config: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (the parent environment pins JAX_PLATFORMS=axon — the
real TPU — which we must not use for unit tests).

Must run before any test module imports jax.

NO PERSISTENT COMPILE CACHE on the CPU test path — deliberately.
Five of eight r5 full-suite runs crashed (SIGSEGV/SIGABRT) inside
XLA:CPU's compile or AOT-deserialization machinery (jax 0.9.0;
faulthandler frames in backend_compile_and_load, _cache_read, and
compilation_cache.get_executable_and_time), always late in the run and
never in module isolation — and EVERY crashed run had deserialized
hundreds of cached CPU AOT executables first, while the only fully-cold
run (plus r3's green run) never crashed. The cpu_aot_loader itself warns
that loaded entries "could lead to execution errors such as SIGILL"
(it flags +prefer-no-scatter/+prefer-no-gather target features even for
same-machine entries). glibc MALLOC_CHECK_/MALLOC_PERTURB_ found no
heap corruption of our own. Conclusion: deserializing XLA:CPU AOT
results is the destabilizer; compiling fresh every run (~33 min vs
~21 warm) buys a suite that has never crashed cold. QWEN3_TTS_CACHE_DIR
is set to "off" so TTSEngine's _enable_compile_cache cannot silently
re-enable a cache mid-suite. machine_cache_dir remains for reference
and for any future jaxlib where the loader is fixed.
"""
import hashlib
import os
import platform


def machine_cache_dir(root: str) -> str:
    """Per-machine CPU compile-cache subdir (kept for reference /
    diagnostics — the suite itself runs cache-less, see the module
    docstring). Keys the dir by a fingerprint of the host CPU's feature
    flags so a copied working tree can never load a foreign machine's
    AOT code."""
    try:
        with open("/proc/cpuinfo") as f:
            src = "".join(line for line in f
                          if line.startswith(("flags", "Features",
                                              "model name")))
    except OSError:
        src = ""
    src = src or f"{platform.machine()}-{platform.processor()}"
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    return os.path.join(root, ".jax_cache_cpu", tag)


os.environ["JAX_PLATFORMS"] = "cpu"
# forbid ANY persistent compile cache in the suite (incl. engines built
# by tests — _enable_compile_cache honors the "off" sentinel)
os.environ["QWEN3_TTS_CACHE_DIR"] = "off"

# Raise the main-thread stack limit (default 8 MiB): the late-suite
# XLA:CPU crashes (see the module docstring) hit DEEP native recursion —
# LLVM codegen under backend_compile, AOT deserialization — on top of a
# deep pytest/JAX Python stack, and a ~8 MiB-edge overflow would present
# exactly as the observed nondeterministic SIGSEGV/SIGABRT with clean
# malloc checks. Linux grows the main stack on demand up to the rlimit
# AT FAULT TIME, so raising it here (hard limit permitting) covers the
# whole run.
try:
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _hard == resource.RLIM_INFINITY or _hard >= _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
    elif _hard > _soft:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ImportError, ValueError, OSError):
    pass
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
