"""OctopusZK-TPU: a TPU-native zkSNARK (Groth16) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
brucechin/OctopusZK (DIZK + CUDA): BN254 field/curve arithmetic as 16-bit
limb tensors, fixed/variable-base MSM, radix-2 NTT, R1CS -> QAP reduction,
and the full Groth16 setup/prove/verify pipeline — serial on one chip and
distributed over a `jax.sharding.Mesh` in place of Spark RDDs.
"""

import os
import platform

import jax

# Persistent compilation cache: the limb-arithmetic graphs are large and
# recompile identically across runs (tests, profiler sweeps, benches).
# The dir is scoped by hostname: XLA:CPU AOT artifacts embed the compile
# machine's CPU features and are rejected (slowly, with error spam) when
# loaded on a different host.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser(
            f"~/.cache/octopuszk_tpu_jax_{platform.node() or 'host'}")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

__version__ = "0.1.0"
