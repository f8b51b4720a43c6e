"""Test harness: force an 8-virtual-device CPU platform before jax import.

Multi-chip sharding paths are validated on this virtual mesh (the real
environment has a single TPU chip); numerical tests are platform-agnostic.
"""
import os

# force, don't setdefault: the launch environment pre-sets JAX_PLATFORMS to
# the TPU platform and tests must run on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# the environment's TPU plugin registers itself at interpreter start and
# overrides JAX_PLATFORMS from the env; the config update below wins.
jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for the CPU suite: serializing the large
# chunked-stepping executable SIGSEGVs inside XLA:CPU AOT export on this
# image (jax 0.9.0, measured round 3 — crash in put_executable_and_time),
# and entries written on one pod machine SIGILL/SIGSEGV when loaded on
# another with different CPU features.  Cold compiles cost a few extra
# minutes per run; a crashing suite costs everything.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end endurance scenarios"
    )


@pytest.fixture()
def rng():
    # fresh per test: keeps every test deterministic and order-independent
    return np.random.RandomState(0)
