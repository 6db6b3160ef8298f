"""Compile the eval step (cache-warm) and print definitions of named
fusions to map profiler spans back to source (op metadata).

Usage: python tools_dev/hlo_inspect_eval.py fusion.2307 fusion.61 fusion.129
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.engine.state import TrainState, make_eval_step
from pctrans_tpu.models import ModelConfig, PCTransModel

ARGS = sys.argv[1:]
# "bbbc" first arg switches to the BBBC protocol shapes (matching
# tools_dev/profile_eval_tpu.py bbbc) so BBBC profiler spans resolve
BBBC = bool(ARGS) and ARGS[0] == "bbbc"
if BBBC:
    ARGS = ARGS[1:]
TARGETS = ARGS or ["fusion.2307", "fusion.61", "fusion.129",
                   "fusion.86", "add_maximum_fusion"]


def main():
    B, H, W, Q, top_k = (2, 520, 696, 300, None) if BBBC \
        else (10, 530, 500, 100, 50)
    config = ModelConfig(dtype="bfloat16", num_queries=Q)
    model = PCTransModel(config=config, train=False)
    x = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    step = jax.jit(make_eval_step(config, top_k=top_k))
    compiled = step.lower(state, x).compile()
    hlo = compiled.as_text()
    print(f"HLO: {len(hlo.splitlines())} lines")
    for tgt in TARGETS:
        pat = re.compile(rf"^\s*%?{re.escape(tgt)}(\.\d+)? = .*$", re.M)
        # fusion definitions appear as 'fused_computation.N' bodies plus the
        # fusion op line carrying metadata; print the op lines
        lines = [l for l in hlo.splitlines()
                 if re.search(rf"\b{re.escape(tgt)}\b", l) and "metadata" in l]
        print(f"\n==== {tgt}: {len(lines)} op lines")
        for l in lines[:6]:
            meta = re.search(r'metadata=\{[^}]*\}', l)
            shape = re.search(r'= ([^ ]+) fusion', l) or re.search(r'= ([^ ]+) ', l)
            print("  shape:", (shape.group(1) if shape else "?")[:80])
            print("  meta :", (meta.group(0) if meta else l.strip())[:240])


if __name__ == "__main__":
    main()
