"""Test configuration: force an 8-device virtual CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so
that multi-device sharding tests exercise real collective lowering
without TPU hardware.
"""

import os

# The image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the TPU plugin), so env assignments here are too
# late for jax's config snapshot — update the live config instead.  The
# backend itself initializes lazily at the first jax op, which is after
# conftest import, so these take effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got %s"
        % jax.default_backend()
    )
    assert jax.device_count() == 8, (
        "expected 8 virtual CPU devices, got %d" % jax.device_count()
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
