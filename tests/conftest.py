"""Test configuration: force an 8-virtual-device CPU platform so multi-chip sharding
(shard_map/pjit over a Mesh) is exercised without TPU hardware, and keep numerics fp32
for parity against torch-CPU oracles.

Mirrors the reference's device-switchable fixture pattern (tests/common.py:94-98,
tests/conftest.py:28-37) with a deterministic tiny-model strategy instead of
checkpoint downloads.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# NOTE: this image's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (one real TPU), so plain env vars are too late — use config.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch-fp32 oracles: disable the bf16-multiply fast path
# JAX uses for fp32 matmuls by default. Production code runs bf16 on the MXU.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: this image has ONE CPU core, so cold XLA
# compiles dominate the suite (~30 min cold); warm re-runs drop to minutes.
# Tests run on the CPU platform, where (unlike the axon tunnel) deserializing
# cached executables is a clear win. Override dir with SEAMLESS_TEST_XLA_CACHE;
# set =0 to disable.
_cache = os.environ.get("SEAMLESS_TEST_XLA_CACHE", "")
if _cache != "0":
    _cache_dir = _cache or os.path.join(os.path.expanduser("~"), ".cache",
                                        "seamless_tpu", "xla_cache_tests")
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jkey():
    return jax.random.PRNGKey(0)


def assert_close(actual, expected, *, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=atol, rtol=rtol)


def assert_unit_close(actual, expected, *, max_mismatch_ratio=0.05):
    """Unit sequences may differ slightly across backends (reference
    tests/common.py:42-62): allow a bounded fraction of mismatched ids."""
    a = np.asarray(actual).ravel()
    e = np.asarray(expected).ravel()
    assert a.shape == e.shape
    mismatch = float(np.mean(a != e))
    assert mismatch <= max_mismatch_ratio, f"unit mismatch ratio {mismatch:.3f}"
