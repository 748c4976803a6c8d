"""Test configuration: force an 8-device CPU mesh.

Mirrors the reference's local-Spark testing strategy (SURVEY.md §4,
DistributedzkSNARKTest.java:57-69 builds a local[*] SparkContext): we run all
tests on CPU with 8 virtual devices so partition/collective logic is
exercised without TPU hardware.
"""

import os
import resource
import sys

# XLA:CPU's recursive optimization passes overflow the default 8 MB stack
# on the big EC modules (segfault in backend_compile_and_load; the crash
# site moves between runs).  The Linux main-thread stack grows up to
# RLIMIT_STACK dynamically, so raising the limit here is enough.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

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
# NOTE two tempting XLA:CPU speedups that are NOT safe here:
# * --xla_backend_optimization_level=1 (1.6x faster compiles): the
#   compiler SEGFAULTS on the bn254b fused double-MSM module at level 1
#   (backend_compile_and_load, reproduced on two full-suite runs).
# * the persistent cache: with --xla_cpu_max_isa pinned the AOT loader
#   accepts its own CPU entries (default-ISA entries embed
#   +prefer-no-gather pseudo-features it rejects), but executable
#   deserialization then segfaults nondeterministically
#   (compilation_cache.get_executable_and_time).
# The dryrun (__graft_entry__) keeps level 1: its module set is smaller
# and has run green repeatedly with it.
os.environ["XLA_FLAGS"] = flags
jax.config.update("jax_compilation_cache_dir", None)

import random

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU accumulates compiler state across the suite's many large
    EC-module compiles until a later compile segfaults (the crash site
    moves with test order; every file passes in isolation).  Dropping the
    executable/tracing caches between test modules keeps the per-process
    compile population bounded."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)
