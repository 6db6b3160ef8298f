"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference framework could only exercise its distributed path with a real
multi-GPU launch (SURVEY.md section 4); here every test runs against
XLA's host-platform device virtualization so sharding is covered in CI.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
