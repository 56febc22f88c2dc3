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
# persistent compile cache: most test wall-time is XLA-CPU recompiles of
# identical tiny-model graphs; cache them across tests and runs
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
