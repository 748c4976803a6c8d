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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)
