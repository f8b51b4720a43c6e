"""Test harness: force an 8-virtual-device CPU platform before jax import.

Multi-chip sharding paths are validated on this virtual mesh (the real
environment has a single TPU chip); numerical tests are platform-agnostic.

Exception: ``TPU_SMOKE=1`` keeps the real device visible for the opt-in
TPU smoke lane (``pytest -m tpu tests/test_tpu_smoke.py``) — the compiled-
TPU path of the Pallas kernels and the chunk op are otherwise exercised
only by bench.py.
"""
import os

TPU_SMOKE = os.environ.get("TPU_SMOKE") == "1"

# force, don't setdefault: the launch environment pre-sets JAX_PLATFORMS to
# the TPU platform and tests must run on the virtual CPU mesh
if not TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not TPU_SMOKE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# the environment's TPU plugin registers itself at interpreter start and
# overrides JAX_PLATFORMS from the env; the config update below wins.
if not TPU_SMOKE:
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
    config.addinivalue_line(
        "markers", "tpu: opt-in real-device smoke lane (TPU_SMOKE=1)"
    )


def pytest_collection_modifyitems(config, items):
    if TPU_SMOKE:
        return
    skip = pytest.mark.skip(reason="TPU smoke lane is opt-in: TPU_SMOKE=1")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture()
def rng():
    # fresh per test: keeps every test deterministic and order-independent
    return np.random.RandomState(0)
