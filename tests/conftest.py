"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference framework could only exercise its distributed path with a real
multi-GPU launch (SURVEY.md section 4); here every test runs against
XLA's host-platform device virtualization so sharding is covered in CI.

NOTE: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (a remote TPU relay), so env-var tricks are too
late — the platform must be forced back to CPU via jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has a single CPU, so re-compiling
# the model stack on every test run dominates wall-clock without it.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
