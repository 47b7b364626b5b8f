"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard JAX recipe for testing multi-chip sharding without a
cluster (SURVEY.md §4 test plan d): all tests run on CPU with 8 virtual
devices; TPU-targeted Pallas kernels run in interpret mode in tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

import jax  # noqa: E402

# float64 islands for parity tests (production code uses explicit dtypes)
jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
