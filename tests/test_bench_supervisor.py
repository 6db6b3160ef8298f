"""bench.py supervisor plumbing (driver-critical, deviceless).

The driver records BENCH_r{N}.json from ``python bench.py``; the supervisor
is what turns a wedged single-client TPU relay (execution RPCs that hang
forever while jax.devices() still answers) into either a successful retry
or one structured JSON line. These tests drive both paths through the real
CLI entrypoint via the BENCH_SELFTEST hooks — no accelerator involved.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu", BENCH_SELFTEST="1")
    env.update(extra_env)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=timeout)


@pytest.mark.slow
def test_supervisor_forwards_child_json():
    r = _run({}, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "selftest"
    assert out["supervisor_attempts"] == 1


@pytest.mark.slow
def test_supervisor_kills_wedged_child_and_reports():
    r = _run({"BENCH_SELFTEST_HANG": "1", "BENCH_STALL_S": "3",
              "BENCH_SUPERVISOR_DEADLINE_S": "12"}, timeout=120)
    # no attempt can produce JSON -> structured supervisor error, nonzero rc
    assert r.returncode != 0
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["error"] == "supervisor"
    assert out["supervisor_attempts"] >= 1
    assert "killing child" in r.stderr


@pytest.mark.slow
def test_supervisor_forwards_partial_from_wedged_child():
    """A child that got a per-phase cumulative line out before wedging:
    the supervisor must forward that partial (not 'no JSON') and exit with
    the normalized deadline code 4 — never the raw negative kill rc."""
    r = _run({"BENCH_SELFTEST_PARTIAL": "1", "BENCH_STALL_S": "3",
              "BENCH_SUPERVISOR_DEADLINE_S": "12"}, timeout=120)
    assert r.returncode == 4, (r.returncode, r.stderr[-500:])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "selftest" and out["value"] == 1.0
    assert out["partial"] is True
    assert "killing child" in r.stderr
