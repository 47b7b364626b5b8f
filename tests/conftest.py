"""Test config: force an 8-device virtual CPU mesh.

The environment's ``sitecustomize.py`` (TPU tunnel plugin) imports jax at
interpreter startup and pins ``jax_platforms=axon``, so plain env vars are
ignored; we override at the config level instead.  The CPU client is created
lazily, so setting ``XLA_FLAGS`` here (before first device use) still takes
effect.  (SURVEY.md §4 test plan d: multi-chip sharding is tested on a
virtual 8-device CPU mesh.)
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# float64 islands for parity tests (production code uses explicit dtypes)
jax.config.update("jax_enable_x64", True)

# exact f32 matmuls/convs for parity tests: XLA's default precision loses
# ~1e-2 absolute even on CPU.  Model code leaves precision unset so the
# production/bench path gets native-bf16 MXU speed.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
