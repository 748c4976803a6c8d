"""OctopusZK-TPU: a TPU-native zkSNARK (Groth16) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
brucechin/OctopusZK (DIZK + CUDA): BN254 field/curve arithmetic as 16-bit
limb tensors, fixed/variable-base MSM, radix-2 NTT, R1CS -> QAP reduction,
and the full Groth16 setup/prove/verify pipeline — serial on one chip and
distributed over a `jax.sharding.Mesh` in place of Spark RDDs.
"""

import os

# Persistent compilation cache: the limb-arithmetic graphs are large and
# recompile identically across runs (tests, profiler sweeps, benches).
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
        "~/.cache/octopuszk_tpu_jax")

__version__ = "0.1.0"
