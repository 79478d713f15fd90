"""Test harness: force an 8-device virtual CPU mesh so every collective /
sharding path is unit-testable without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before backend initialization.  NOTE: this environment may
# pre-register a TPU PJRT plugin via sitecustomize with JAX_PLATFORMS
# already captured, so setting the env var alone is not enough — use
# jax.config (backends initialize lazily, so this still wins).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 16 virtual devices: 8 for the standard mesh tests + headroom for the
    # GQA kv-replication tests (head-sharding wider than the 8 kv heads)
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=16").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual cpu devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture(scope="session")
def sixteen_devices():
    devs = jax.devices()
    assert len(devs) >= 16, f"expected >=16 virtual cpu devices, got {len(devs)}"
    return devs
