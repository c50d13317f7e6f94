"""Test env: force CPU backend with 8 virtual devices for sharding tests.

The container's sitecustomize force-registers the axon TPU tunnel backend
(and env has JAX_PLATFORMS=axon), which is both slow per-dispatch and hangs
at process exit — so tests explicitly pin jax to CPU *after* import, which
is the only override that sticks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# tests exercise the perceptual-loss structure without pretrained npz
os.environ.setdefault("GOLIATH_TPU_ALLOW_RANDOM_FEATURES", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-res conv stacks etc.)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
