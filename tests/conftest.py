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

# The persistent compilation cache must stay OFF under pytest: sharing
# /tmp/magi_tpu_jit_cache with a concurrent TPU process segfaults jax's
# executable deserializer, and even a dedicated CPU-only cache dir
# segfaults in compilation_cache.get_executable_and_time once ~140 tests
# of compiled programs/collectives have accumulated in the process
# (reproduced twice at tests/test_vae.py::test_encode_decode_shapes).
# MagiPipeline only sets the cache *dir*, so disabling the cache here
# wins even for pipeline e2e tests.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Full-suite runs (151 tests) segfault XLA:CPU's compiler near the END
    of the suite (test_vae, three repros at ~#145-151) while every subset
    passes: the process pins every executable ever compiled — via live jit
    closures in transport._JIT_CACHE (one entry per config content) plus
    jax's own caches — and after ~140 tests of programs the next LLVM JIT
    compilation dies.  Dropping the sampler closure cache and jax caches
    between modules keeps the live-executable set bounded."""
    yield
    try:
        from magi_tpu.sampling import transport

        transport._JIT_CACHE.clear()
    except Exception:
        pass
    jax.clear_caches()


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
