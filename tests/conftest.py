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
    config.addinivalue_line(
        "markers",
        "fast: <5-min smoke subset (run with -m fast); auto-applied to the "
        "modules in _FAST_FILES below")


# Modules whose whole-file runtime is small on this 1-core box (unit-level
# oracles, no big-model compiles). Curated from a --durations=0 run; the
# full suite is ~40-55 min, this subset must stay < 5 min total.
_FAST_FILES = {
    "test_core_utils.py",
    "test_losses.py",
    "test_scatter.py",
    "test_shadowmap.py",
    "test_native_zipio.py",
    "test_dataloader.py",
    "test_nn.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.fspath.basename in _FAST_FILES
                and "slow" not in item.keywords):
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
