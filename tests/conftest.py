"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 test plan). Must be
set before JAX initializes, hence in conftest at import time.
"""

import os

# force CPU even if the ambient env selects a TPU platform (e.g. axon)
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: this box has 2 CPUs and ~seconds-long XLA
# compiles; caching makes repeated pytest runs tractable
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# belt-and-braces: the env var alone has been observed to lose to the
# ambient axon platform; the config update always wins
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
