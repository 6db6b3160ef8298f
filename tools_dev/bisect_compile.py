"""Dev utility: bisect train-step compile time on this host."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pctrans_tpu.models import PCTransModel, ModelConfig
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.data.targets import targets_from_labels

TINY = ModelConfig(hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=10, nheads=4,
                   dim_feedforward=64, enc_layers=1, dec_layers=3, head_norm="GN",
                   backbone_depth=14)
model = PCTransModel(config=TINY, train=True)
x = jnp.zeros((1, 32, 32, 3))
t0 = time.time()
variables = jax.jit(model.init)(jax.random.key(0), x)
jax.block_until_ready(variables)
print("init compile+run", time.time() - t0, flush=True)

frozen = {k: v for k, v in variables.items() if k != "params"}

def loss_model(p):
    out = model.apply({"params": p, **frozen}, x)
    return (out["pred_masks"].sum() + out["reference_points"].sum()
            + out["sem_mask"].sum() + out["mask_features"].sum()
            + out["query_emb"].sum() + sum(m.sum() for m in out["aux_masks"]))

t0 = time.time()
g = jax.jit(jax.grad(loss_model))(variables["params"])
jax.block_until_ready(g)
print("model fwd+bwd compile", time.time() - t0, flush=True)

crit = SetCriterion(CriterionConfig(num_points=256, dec_layers=4))
label = np.zeros((1, 32, 32), np.int32)
label[0, 4:12, 4:12] = 1
label[0, 20:28, 18:28] = 2
targets = targets_from_labels(jnp.array(label), 8)
out = model.apply(variables, x)
out = jax.tree_util.tree_map(jnp.asarray, out)

t0 = time.time()
tot, losses = jax.jit(crit.__call__)(jax.random.key(0), out, targets)
jax.block_until_ready(tot)
print("criterion fwd compile", time.time() - t0, flush=True)

def loss_crit(masks):
    o = dict(out)
    o["pred_masks"] = masks
    t, _ = crit(jax.random.key(0), o, targets)
    return t

t0 = time.time()
g = jax.jit(jax.grad(loss_crit))(out["pred_masks"])
jax.block_until_ready(g)
print("criterion bwd compile", time.time() - t0, flush=True)

# 4. combined train step
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.config import get_cfg_defaults
cfg = get_cfg_defaults()
tx = build_optimizer(cfg, variables["params"])
state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                   frozen=variables.get("frozen", {}),
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]))
step = jax.jit(make_train_step(TINY, crit, tx, max_instances=8))
batch = {"image": jnp.zeros((1, 32, 32, 3)), "label": jnp.array(label)}
t0 = time.time()
state2, metrics = step(state, batch, jax.random.key(0))
jax.block_until_ready(metrics["loss"])
print("combined train step compile", time.time() - t0, flush=True)

# 5. steady-state step runtime
t0 = time.time()
for i in range(3):
    state2, metrics = step(state2, batch, jax.random.key(i))
jax.block_until_ready(metrics["loss"])
print("3 steps runtime", time.time() - t0, "loss", float(metrics["loss"]), flush=True)
