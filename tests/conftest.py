"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard JAX substitute for multi-node test rigs (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` fakes 8 devices on CPU so sharding
and collective paths are exercised without TPU hardware.

NOTE: this image's jax build defaults ``jax_platforms`` to "axon,cpu"
(the TPU tunnel) and IGNORES the ``JAX_PLATFORMS`` env var, so we must
override via ``jax.config`` after import — env vars alone silently leave
tests running over the TPU tunnel (slow and serialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")
