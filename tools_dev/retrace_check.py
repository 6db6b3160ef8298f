import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_log_compiles", True)
from pctrans_tpu.models import ModelConfig, PCTransModel
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.config import get_cfg_defaults

TINY = ModelConfig(hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=10, nheads=4,
                   dim_feedforward=64, enc_layers=1, dec_layers=3, head_norm="GN",
                   backbone_depth=14)
crit = SetCriterion(CriterionConfig(num_points=256, dec_layers=4))
model = PCTransModel(config=TINY, train=True)
x = jnp.zeros((1, 32, 32, 3))
variables = jax.jit(model.init)(jax.random.key(0), x)
cfg = get_cfg_defaults()
tx = build_optimizer(cfg, variables["params"])
state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                   frozen=variables.get("frozen", {}),
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]))
label = np.zeros((1, 32, 32), np.int32); label[0, 4:12, 4:12] = 1
batch = {"image": x, "label": jnp.array(label)}
step = jax.jit(make_train_step(TINY, crit, tx, max_instances=8))
for i in range(3):
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.key(i))
    jax.block_until_ready(metrics["loss"])
    print(f"step {i}: {time.time()-t0:.2f}s loss={float(metrics['loss']):.4f}", flush=True)
