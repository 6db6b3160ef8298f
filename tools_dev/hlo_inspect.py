"""Lower+compile the train step (cache-warm) and print the definitions of
named fusions/ops to map profiler spans back to source (op metadata)."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.config import load_cfg
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import build_criterion
from pctrans_tpu.models import PCTransModel, build_model_config

TARGETS = sys.argv[1:] or ["fusion.67", "sort", "while.430", "while.451"]


def main():
    cfg = load_cfg("/root/reference/configs/CVPPP/CVPPP-PCTrans-Base.yaml",
                   "/root/reference/configs/CVPPP/CVPPP-PCTrans.yaml",
                   freeze=False)
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.freeze()
    mc = build_model_config(cfg)
    criterion = build_criterion(cfg)
    model = PCTransModel(config=mc, train=True)
    rng = jax.random.key(0)
    img = jnp.zeros((2, 448, 448, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, img)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(mc, criterion, tx, cfg.MODEL.MAX_INSTANCES)
    lab = jnp.zeros((2, 448, 448), jnp.int32)
    lowered = jax.jit(step_fn).lower(state, {"image": img, "label": lab}, rng)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO chars: {len(txt)}")
    for t in TARGETS:
        # root definition line of the computation named %<t> or the call site
        pat = re.compile(rf"^\s*%?{re.escape(t)}(\.\d+)? = .*$", re.M)
        hits = pat.findall(txt)
        # fallback: find "fusion.67 = " style call lines
        lines = [l for l in txt.splitlines() if f"%{t} = " in l or f" {t} = " in l]
        print(f"\n===== {t}: {len(lines)} lines")
        for l in lines[:4]:
            print(l[:600])
        # fused computation body name, then show its instruction mix
        m = re.search(rf"{re.escape(t)} = [^\n]*calls=%?([\w.\-]+)", txt)
        if m:
            body = m.group(1)
            bm = re.search(rf"^%?{re.escape(body)} [^\n]*\{{(.*?)^\}}", txt,
                           re.M | re.S)
            if bm:
                ops = re.findall(r"= ([a-z0-9\-]+)\(", bm.group(1))
                from collections import Counter
                print("  body op mix:", Counter(ops).most_common(12))
                meta = re.findall(r'op_name="([^"]+)"', bm.group(1))
                from collections import Counter as C2
                print("  op_names:", C2(meta).most_common(8))


if __name__ == "__main__":
    main()
