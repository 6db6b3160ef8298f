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
# cache every compile, however small: the suite runs hundreds of sub-second
# XLA CPU compiles whose sum is tens of seconds on this single-CPU host
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Cache-state banner: the warm suite runs in ~6 min, true-cold is ~25 min
# projected (VERDICT_RESPONSES_r3.md section 6) — far beyond a typical CI
# window.  A wiped /tmp must read as "prime me" in the first line of output,
# not as a mystery timeout.  tools_dev/prime_cache.sh pre-populates it.
_CACHE_DIR = "/tmp/jax_cache"
try:
    _n_entries = len(os.listdir(_CACHE_DIR))
    _cache_mb = sum(
        os.path.getsize(os.path.join(_CACHE_DIR, f))
        for f in os.listdir(_CACHE_DIR)) / 1e6
except OSError:
    _n_entries, _cache_mb = 0, 0.0
if _n_entries < 50:
    import warnings

    warnings.warn(
        f"[conftest] XLA compile cache {_CACHE_DIR} is cold "
        f"({_n_entries} entries): expect a ~1600 s first run on this "
        "single-CPU host (warm: ~360 s). Run tools_dev/prime_cache.sh "
        "before a timed window.", stacklevel=0)
print(f"[conftest] XLA compile cache: {_CACHE_DIR} "
      f"({_n_entries} entries, {_cache_mb:.0f} MB)")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native C++ metrics library when a toolchain exists, so
# tests/test_native.py actually runs on a stock checkout instead of
# silently skipping (round-2 verdict item 7).  Skip only when no compiler
# is available or the build fails (the numpy fallback is always tested).
import shutil  # noqa: E402
import subprocess  # noqa: E402

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
if shutil.which("make") and shutil.which(os.environ.get("CXX", "g++")):
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError) as e:
        print(f"[conftest] native metrics build failed ({e}); "
              "test_native.py will skip")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------- test tiers
# The suite is two-tiered (pytest.ini addopts defaults to the FAST tier):
# round-4 review flagged 2.6x warm-suite growth in one round (343 tests/354 s
# -> 388/918 s), heading for driver-window timeouts.  The banner below makes
# the tier split visible on every run, and the session hook warns when the
# fast tier overruns its budget so growth is caught in review, not in a
# timed-out CI window.
FAST_TIER_BUDGET_S = 450  # warm-cache, this single-CPU host


def pytest_collection_modifyitems(config, items):
    slow = sum(1 for it in items if it.get_closest_marker("slow"))
    deselected = " (deselected by default -m 'not slow')" \
        if config.getoption("-m") == "not slow" else ""
    print(f"\n[conftest] tiers: {len(items) - slow} fast / {slow} slow "
          f"collected{deselected}; fast-tier budget {FAST_TIER_BUDGET_S}s warm")


def pytest_sessionstart(session):
    session._tier_t0 = __import__("time").perf_counter()


def pytest_sessionfinish(session, exitstatus):
    import time as _time

    elapsed = _time.perf_counter() - getattr(session, "_tier_t0",
                                             _time.perf_counter())
    if (session.config.getoption("-m") == "not slow"
            and elapsed > FAST_TIER_BUDGET_S):
        import warnings

        warnings.warn(
            f"[conftest] FAST tier took {elapsed:.0f}s > budget "
            f"{FAST_TIER_BUDGET_S}s (warm?). Move new heavyweight tests to "
            "@pytest.mark.slow or raise the budget deliberately.",
            stacklevel=0)
