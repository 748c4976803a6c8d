"""OctopusZK-TPU: a TPU-native zkSNARK (Groth16) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
brucechin/OctopusZK (DIZK + CUDA): BN254 field/curve arithmetic as 16-bit
limb tensors, fixed/variable-base MSM, radix-2 NTT, R1CS -> QAP reduction,
and the full Groth16 setup/prove/verify pipeline — serial on one chip and
distributed over a `jax.sharding.Mesh` in place of Spark RDDs.
"""

import os

# XLA:CPU's recursive optimization passes overflow the default 8 MB stack
# on the big EC modules (segfault/abort inside backend_compile_and_load).
# The Linux main-thread stack grows dynamically up to RLIMIT_STACK, so
# raising the soft limit covers the main thread.  Worker threads that run
# compiles (the G2-overlap executor in parallel/dgroth16.py) get a big
# fixed stack at creation via utils.workers.big_stack_executor — scoped
# there rather than set process-wide, so threads an embedding application
# creates are unaffected.
try:
    import resource as _resource
    _soft, _hard = _resource.getrlimit(_resource.RLIMIT_STACK)
    if _soft != _resource.RLIM_INFINITY:
        _resource.setrlimit(_resource.RLIMIT_STACK, (_hard, _hard))
except (ImportError, ValueError, OSError):
    pass

import jax

# Persistent compilation cache: the limb-arithmetic graphs are large and
# recompile identically across runs (tests, profiler sweeps, benches) —
# but ONLY for accelerator platforms.  XLA:CPU AOT cache entries embed
# LLVM tuning pseudo-features (+prefer-no-gather/+prefer-no-scatter) that
# the loader then rejects as unsupported "machine features" EVEN ON THE
# MACHINE THAT WROTE THEM, so on CPU every cache hit fails slowly with
# error spam and recompiles anyway; and this fleet shares one hostname
# ("vm"), so hostname-scoped dirs poison each other across machines.
_plats = os.environ.get("JAX_PLATFORMS", "").lower()
if _plats and "cpu" not in _plats:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/octopuszk_tpu_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

__version__ = "0.1.0"
