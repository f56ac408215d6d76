"""Test configuration: force an 8-device virtual CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so
that multi-device sharding tests exercise real collective lowering
without TPU hardware.
"""

import os

# NOTE: assignment, not setdefault — the image presets JAX_PLATFORMS=axon
# (the TPU plugin); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
