"""Test configuration: force an 8-device CPU mesh.

Mirrors the reference's local-Spark testing strategy (SURVEY.md §4,
DistributedzkSNARKTest.java:57-69 builds a local[*] SparkContext): we run all
tests on CPU with 8 virtual devices so partition/collective logic is
exercised without TPU hardware.
"""

import os
import sys

# hard override: the environment pre-sets JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on the virtual CPU mesh.  Also hide the axon
# plugin package entirely — merely registering it opens the (single
# client) tunnel connection and would starve concurrent real-TPU jobs.
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if ".axon_site" not in p)

# jaxtyping's pytest plugin imports jax BEFORE this conftest runs, baking
# JAX_PLATFORMS=axon into the config — override it post-import too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU compile time dominates the suite (EC modules take minutes at
# full opt level; ~1.6x faster at level 1).  Tests assert bit-exact
# results, so any level-1 miscompile would fail loudly.
# NOTE: do NOT enable the persistent cache here.  With --xla_cpu_max_isa
# pinned the AOT loader accepts its own CPU entries (default-ISA entries
# embed +prefer-no-gather pseudo-features it rejects), but executable
# DESERIALIZATION then segfaults nondeterministically inside
# compilation_cache.get_executable_and_time — observed twice on full-tier
# runs, never on per-file runs.
if "xla_backend_optimization_level" not in flags:
    flags = flags + " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags
jax.config.update("jax_compilation_cache_dir", None)

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)
