"""Test environment: deterministic 8-virtual-device CPU mesh.

Pallas kernels run in interpret mode on CPU; the separate TPU parity checks in
bench.py exercise the compiled Mosaic path on real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The preinstalled axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly
# so unit tests never cross the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
