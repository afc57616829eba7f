"""Test configuration: force an 8-virtual-device CPU JAX platform so the
multi-chip sharding paths compile and execute without TPU hardware.

NOTE: this environment's sitecustomize force-registers a TPU PJRT plugin
(JAX_PLATFORMS env alone is not enough), so we also pin the platform via
jax.config before any jax use.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(12345)
