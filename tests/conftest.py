"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding logic (shard_map/pjit over a Mesh) is exercised on a
simulated 8-device CPU mesh, per SURVEY.md §4: tests must run without a TPU.
"""

import os

# Must be set before jax initializes its backends. The environment may export
# JAX_PLATFORMS=axon (the TPU tunnel) — tests force-override it to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
