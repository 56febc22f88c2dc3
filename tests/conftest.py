import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late.  Force the CPU backend with an 8-device virtual mesh before any
# backend is instantiated: unit tests must be fast and hermetic; TPU runs
# happen via bench.py / tools/.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
