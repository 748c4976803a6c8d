"""Test configuration: force an 8-device CPU mesh.

Mirrors the reference's local-Spark testing strategy (SURVEY.md §4,
DistributedzkSNARKTest.java:57-69 builds a local[*] SparkContext): we run all
tests on CPU with 8 virtual devices so partition/collective logic is
exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
