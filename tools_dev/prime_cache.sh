#!/bin/bash
# Prime the persistent XLA compile cache (/tmp/jax_cache) for the test
# suite, so a subsequent `pytest tests/ -q` fits one CI window.
#
# Why this exists: tests/conftest.py keys every XLA CPU compile into
# jax's persistent cache (min_compile_time 0), so a WARM suite run is
# execution-bound — measured 433 s on this 1-CPU host (336 tests,
# 2026-08-19).  A fully COLD cache is a different regime: the suite
# compiles hundreds of distinct XLA programs serially on one CPU and
# measured >840 s at only ~53% progress (~1600 s projected).  No test
# diet fixes that without deleting coverage; the compile work is the
# irreducible cost of first contact with this host.  The fix is to pay
# it ONCE, outside the test window, by running the suite itself with no
# deadline — the suite is exactly the program set worth priming.
#
# Usage:  bash tools_dev/prime_cache.sh       (one-time, ~25 min cold)
# After:  cd /root/repo && env -u PALLAS_AXON_POOL_IPS \
#             python -m pytest tests/ -q      (fits a 590 s window)
set -e
cd "$(dirname "$0")/.."
echo "priming /tmp/jax_cache via a full suite run (no deadline)..."
env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -q
echo "cache primed: $(du -sh /tmp/jax_cache 2>/dev/null | cut -f1)"
