"""Test session setup: force a deterministic 8-device CPU mesh.

Mirrors the reference's session-wide determinism pinning
(reference tests/conftest.py:12-22) and adds the multi-device CPU topology
that the TPU build uses to exercise sharding without real chips.
Must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic tests: never write the user-level persistent compilation cache
# (test_compile_cache.py opts back in against tmp dirs).
os.environ.setdefault("AVEX_COMPILE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config knob
# wins over it and pins the test session to the virtual 8-device CPU topology.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
